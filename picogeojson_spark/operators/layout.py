"""Z-order (Morton) spatial data layout — clustering for scan pruning.

The 100 TB story: parquet/Iceberg scans prune files and row groups by
column min/max statistics. A table laid out in ingest order has lon/lat
ranges spanning the whole planet in every file, so a bbox query reads
everything; sorting by ONE of lon/lat tightens only that column. The
Z-order curve interleaves the bits of both coordinates, so range-sorting
by the key clusters rows that are close in BOTH dimensions into the same
files — a bbox predicate then skips the vast majority of row groups via
the ordinary stats Spark already pushes down (same mechanism as
Delta/Iceberg OPTIMIZE ZORDER BY).

Everything here is JVM-side integer expressions (shift/mask/or chains the
codegen inlines) — no UDF, no extra shuffle beyond the one range
repartition any clustering requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamped fixed-grid cell index in [0, 2^bits)."""
    n = 1 << bits
    x = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(n))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), x)).cast("long")


def zorder_key(lon: Column, lat: Column, bits: int = 16) -> Column:
    """Morton key interleaving ``bits`` quantized bits of lon (even
    positions) and lat (odd positions) -> a single long in
    [0, 2^(2*bits)). ``bits <= 31`` keeps the key in a signed 64-bit long.

    The interleave is one flat bitwise-OR chain of shift/mask terms — a
    pure whole-stage-codegen expression, evaluated once per row.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    qx = _quantize(lon, -180.0, 180.0, bits)
    qy = _quantize(lat, -90.0, 90.0, bits)
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)),
                                 2 * i))
        terms.append(F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)),
                                 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out.cast("long")


def zorder_key_sql(lon: str, lat: str, bits: int = 16) -> str:
    """The DuckDB spelling of :func:`zorder_key` — identical quantize +
    interleave arithmetic so oracle hashes match bit-for-bit."""
    n = 1 << bits
    qx = ("GREATEST(0, LEAST({m}, CAST(floor(({c} - (-180.0)) / 360.0 * {n})"
          " AS BIGINT)))").format(c=lon, n=n, m=n - 1)
    qy = ("GREATEST(0, LEAST({m}, CAST(floor(({c} - (-90.0)) / 180.0 * {n})"
          " AS BIGINT)))").format(c=lat, n=n, m=n - 1)
    terms = []
    for i in range(bits):
        terms.append("((({qx}) >> {i}) & 1) << {s}".format(qx=qx, i=i, s=2 * i))
        terms.append("((({qy}) >> {i}) & 1) << {s}".format(qy=qy, i=i,
                                                           s=2 * i + 1))
    return "CAST((" + " | ".join("(" + t + ")" for t in terms) + ") AS BIGINT)"


def write_zordered(
    df: DataFrame,
    path: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = 16,
    num_files: int = None,
) -> None:
    """Write ``df`` as parquet clustered along the Z-order curve: range-
    repartition by the Morton key (one shuffle — the price of any
    clustering), sort within partitions, drop the key. Row-group lon/lat
    min/max stats come out tight in both dimensions, so downstream bbox
    scans prune (see tests/test_layout.py for the measured row-group skip
    rate vs ingest order).
    """
    keyed = df.withColumn("_zkey", zorder_key(F.col(lon_col), F.col(lat_col),
                                              bits))
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_ranges(lon_min: float, lat_min: float, lon_max: float,
                  lat_max: float, bits: int = 16,
                  max_depth: int = 8) -> list:
    """Decompose a bbox into a sorted list of disjoint Morton-key ranges
    ``[(lo, hi), ...]`` that together form a tight SUPERSET of the bbox's
    cells — the query-side of :func:`write_zordered`: filter the clustered
    table with ``zkey BETWEEN`` these ranges (file/row-group stats prune on
    them) then refine with the exact lon/lat predicate.

    Quadtree decomposition over z-aligned square blocks (any aligned
    2^k x 2^k block is one CONTIGUOUS z interval): blocks fully inside the
    bbox emit their interval, disjoint blocks are dropped, straddling
    blocks recurse. ``max_depth`` bounds both the recursion and the range
    count (4 * max_depth * depth-ish in the worst case — blocks still
    straddling at the floor emit wholesale; the refine step keeps the
    answer exact). Adjacent intervals are merged.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    n = 1 << bits

    def q(v, lo, hi):
        x = int(((v - lo) / (hi - lo)) * n)
        return max(0, min(n - 1, x))

    qx0, qx1 = q(lon_min, -180.0, 180.0), q(lon_max, -180.0, 180.0)
    qy0, qy1 = q(lat_min, -90.0, 90.0), q(lat_max, -90.0, 90.0)

    def interleave(x, y):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    out = []

    def rec(bx, by, k, depth):
        side = 1 << k
        x0, y0 = bx * side, by * side
        x1, y1 = x0 + side - 1, y0 + side - 1
        if x1 < qx0 or x0 > qx1 or y1 < qy0 or y0 > qy1:
            return
        inside = qx0 <= x0 and x1 <= qx1 and qy0 <= y0 and y1 <= qy1
        if inside or k == 0 or depth >= max_depth:
            base = interleave(x0, y0)
            out.append((base, base + (1 << (2 * k)) - 1))
            return
        for dy in (0, 1):
            for dx in (0, 1):
                rec(2 * bx + dx, 2 * by + dy, k - 1, depth + 1)

    rec(0, 0, bits, 0)
    out.sort()
    merged = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged


def bbox_filter_zordered(df: DataFrame, lon_min: float, lat_min: float,
                         lon_max: float, lat_max: float, bits: int = 16,
                         lon_col: str = "lon", lat_col: str = "lat",
                         zkey_col: str = None) -> DataFrame:
    """Exact bbox filter over a Z-order-clustered table: the Morton-range
    prefilter (pushdown-friendly BETWEEN disjunction over ``zorder_ranges``)
    plus the exact lon/lat refine. If the table carries a persisted key
    column pass ``zkey_col``; otherwise the key is recomputed from
    lon/lat (the refine columns' own min/max stats still prune, since the
    layout clustered them)."""
    key = (F.col(zkey_col) if zkey_col
           else zorder_key(F.col(lon_col), F.col(lat_col), bits))
    ranges = zorder_ranges(lon_min, lat_min, lon_max, lat_max, bits)
    cond = None
    for lo, hi in ranges:
        c = key.between(int(lo), int(hi))
        cond = c if cond is None else (cond | c)
    exact = (
        (F.col(lon_col) >= lon_min) & (F.col(lon_col) <= lon_max)
        & (F.col(lat_col) >= lat_min) & (F.col(lat_col) <= lat_max)
    )
    return df.filter(cond & exact)


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lon: Column, lat: Column, precision: int = 6) -> Column:
    """Standard base-32 geohash string of a point (Niemeyer layout: bits
    alternate lon-first MSB->LSB, 5 bits per character) — the string-keyed
    sibling of :func:`zorder_key` for systems that partition or prefix-
    filter on geohash strings. Pure JVM expressions: two quantizes, one
    flat interleave OR-chain, ``precision`` array lookups; no UDF, no
    shuffle.

    The per-axis quantize floor((x - lo) / extent * 2^bits) is exactly
    successive bisection, so output matches the canonical algorithm
    (pinned against published geohashes in tests).
    """
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    qx = _quantize(lon, -180.0, 180.0, lon_bits)
    qy = _quantize(lat, -90.0, 90.0, lat_bits)
    terms = []
    for i in range(lon_bits):
        terms.append(F.shiftleft(
            F.shiftright(qx, lon_bits - 1 - i).bitwiseAND(F.lit(1)),
            total - 1 - 2 * i))
    for j in range(lat_bits):
        terms.append(F.shiftleft(
            F.shiftright(qy, lat_bits - 1 - j).bitwiseAND(F.lit(1)),
            total - 2 - 2 * j))
    code = terms[0]
    for t in terms[1:]:
        code = code.bitwiseOR(t)
    alphabet = F.array(*[F.lit(c) for c in _GEOHASH32])
    chars = [
        F.element_at(
            alphabet,
            (F.shiftright(code, 5 * (precision - 1 - j))
             .bitwiseAND(F.lit(31))).cast("int") + F.lit(1))
        for j in range(precision)
    ]
    return F.concat(*chars)


def geohash_encode_sql(lon: str, lat: str, precision: int = 6) -> str:
    """DuckDB spelling of :func:`geohash_encode` (identical arithmetic)."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2

    def q(col, lo, extent, bits):
        n = 1 << bits
        return ("GREATEST(0, LEAST({m}, CAST(floor(({c} - ({lo})) / {e} "
                "* {n}) AS BIGINT)))").format(c=col, lo=lo, e=extent,
                                              n=n, m=n - 1)

    qx = q(lon, -180.0, 360.0, lon_bits)
    qy = q(lat, -90.0, 180.0, lat_bits)
    terms = []
    for i in range(lon_bits):
        terms.append("((({q}) >> {i}) & 1) << {s}".format(
            q=qx, i=lon_bits - 1 - i, s=total - 1 - 2 * i))
    for j in range(lat_bits):
        terms.append("((({q}) >> {i}) & 1) << {s}".format(
            q=qy, i=lat_bits - 1 - j, s=total - 2 - 2 * j))
    code = "(" + " | ".join("(" + t + ")" for t in terms) + ")"
    chars = [
        "substr('{a}', CAST((({code} >> {s}) & 31) AS INT) + 1, 1)".format(
            a=_GEOHASH32, code=code, s=5 * (precision - 1 - j))
        for j in range(precision)
    ]
    return " || ".join(chars)


# --------------------------------------------------------------------------
# Hilbert curve — the locality-optimal sibling of zorder_key.
#
# The Morton curve's long diagonal jumps leave some spatially-adjacent
# cells far apart on the key line; the Hilbert curve visits every cell of
# the 2^bits x 2^bits grid in a path whose EVERY step is between
# Manhattan-adjacent cells (proven exhaustively in tests), so range-
# clustering on it yields strictly tighter per-file bboxes. This is the
# curve behind Databricks liquid clustering / Iceberg's hilbert sort.
#
# Formulation: the textbook algorithm mutates (x, y) with per-level
# swap/reflect steps — as a Catalyst expression that nesting duplicates
# subtrees exponentially. Instead we fold the accumulated transform into
# a 4-state automaton (state = (swap, complement-x, complement-y), only 4
# of the 8 dihedral states are reachable from identity): at each level the
# RAW quantized bits (bx, by) plus the state select a 2-bit output digit
# and the next state from two 16-entry lookup tables. The state chain
# references each previous state exactly twice (next-state + digit), so
# the whole key is an O(bits^2)-node pure-codegen expression — no UDF, no
# loop, no shuffle. Tables derived from the recursive definition and
# verified exhaustively (bijection + unit-step adjacency) in
# tests/test_hilbert.py.
# --------------------------------------------------------------------------

# idx = state*4 + bx*2 + by  ->  output digit / next state.
_HILBERT_Q = (0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0)
_HILBERT_S = (1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2)


def hilbert_key(lon: Column, lat: Column, bits: int = 16) -> Column:
    """Hilbert-curve key of a point on the 2^bits x 2^bits grid over
    (lon, lat) in [0, 4^bits) — same quantize as :func:`zorder_key`, so
    the two keys are directly comparable clusterings of the same cells.
    ``bits <= 31`` keeps the key in a signed 64-bit long."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    qx = _quantize(lon, -180.0, 180.0, bits)
    qy = _quantize(lat, -90.0, 90.0, bits)
    q_arr = F.array(*[F.lit(v) for v in _HILBERT_Q])
    s_arr = F.array(*[F.lit(v) for v in _HILBERT_S])
    st = F.lit(0)
    terms = []
    for i in range(bits - 1, -1, -1):
        bx = F.shiftright(qx, i).bitwiseAND(F.lit(1))
        by = F.shiftright(qy, i).bitwiseAND(F.lit(1))
        idx = (st * 4 + bx * 2 + by).cast("int") + F.lit(1)
        terms.append(F.shiftleft(F.element_at(q_arr, idx).cast("long"),
                                 2 * i))
        st = F.element_at(s_arr, idx)
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out.cast("long")


def hilbert_key_sql(lon: str, lat: str, bits: int = 16) -> str:
    """DuckDB spelling of :func:`hilbert_key` — identical quantize,
    identical automaton lookups (1-based list literals), so oracle hashes
    match bit-for-bit. Text size is O(bits^2); keep oracle queries at
    bits <= 10."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    n = 1 << bits
    qx = ("GREATEST(0, LEAST({m}, CAST(floor(({c} - (-180.0)) / 360.0 * {n})"
          " AS BIGINT)))").format(c=lon, n=n, m=n - 1)
    qy = ("GREATEST(0, LEAST({m}, CAST(floor(({c} - (-90.0)) / 180.0 * {n})"
          " AS BIGINT)))").format(c=lat, n=n, m=n - 1)
    q_lit = "[" + ", ".join(str(v) for v in _HILBERT_Q) + "]"
    s_lit = "[" + ", ".join(str(v) for v in _HILBERT_S) + "]"
    st = "0"
    terms = []
    for i in range(bits - 1, -1, -1):
        idx = ("(({st}) * 4 + ((({qx}) >> {i}) & 1) * 2 "
               "+ ((({qy}) >> {i}) & 1) + 1)").format(st=st, qx=qx, qy=qy,
                                                      i=i)
        terms.append("(CAST({q}[{idx}] AS BIGINT) << {s})".format(
            q=q_lit, idx=idx, s=2 * i))
        st = "({s}[{idx}])".format(s=s_lit, idx=idx)
    return "CAST((" + " | ".join(terms) + ") AS BIGINT)"


def write_hilbert_ordered(
    df: DataFrame,
    path: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = 16,
    num_files: int = None,
) -> None:
    """Parquet writer clustered along the Hilbert curve — the
    :func:`write_zordered` shape (ONE range repartition, the price of any
    clustering) on the tighter-locality key."""
    keyed = df.withColumn("_hkey", hilbert_key(F.col(lon_col),
                                               F.col(lat_col), bits))
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, "_hkey")
        .sortWithinPartitions("_hkey")
        .drop("_hkey")
        .write.mode("overwrite")
        .parquet(path)
    )
