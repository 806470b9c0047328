"""End-to-end Spark pipeline tests: synth pages -> mine/parse/explode ->
cell index -> PIP join / kNN / tiles, each checked against a driver-side
O(n²) oracle built on the same kernel."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from picogeojson_spark.geo import loads as kloads
from picogeojson_spark.geo.pip import points_in_geometry
from picogeojson_spark.operators import (
    assign_tiles_points,
    filter_by_props,
    filter_by_type,
    knn_join,
    mine_features,
    pip_join,
    with_reextracted_text,
)
from picogeojson_spark.sources.synth import make_page, pages_dataframe

N_PAGES = 240


@pytest.fixture(scope="module")
def pages(spark):
    df = pages_dataframe(spark, N_PAGES, partitions=4).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def features(spark, pages):
    df = mine_features(pages).cache()
    df.count()
    return df


def test_text_byte_identity(spark, pages):
    """BASELINE.json invariant: extractor output in the engine matches the
    stored text byte-for-byte, per url."""
    df = with_reextracted_text(pages)
    mismatches = df.filter("text != text_reextracted").count()
    assert mismatches == 0


def test_mined_features_match_oracle(spark, features):
    """Every embedded GeoJSON block is found and parsed identically to a
    driver-side run of the same kernel over the same text."""
    from picogeojson_spark.operators.features import (
        _doc_id,
        _feature_rows,
        mine_candidates,
    )
    from picogeojson_spark.geo import codec

    got = {
        (r["url"], r["feature_idx"]): (r["geom_type"], r["geometry_json"])
        for r in features.collect()
    }
    expected = {}
    n_err = 0
    for i in range(N_PAGES):
        page = make_page(i)
        parsed_docs = []
        for raw in mine_candidates(page["text"]):
            try:
                parsed_docs.append((codec.loads(raw), None, raw))
            except Exception as e:  # noqa: BLE001
                parsed_docs.append((None, str(e), raw))
        for row in _feature_rows(page["url"], _doc_id(page["url"]), parsed_docs, 12, 32):
            expected[(row["url"], row["feature_idx"])] = (
                row["geom_type"],
                row["geometry_json"],
            )
            if row["parse_error"] is not None:
                n_err += 1
    assert got == expected
    assert len(expected) > N_PAGES * 0.5  # corpus actually contains geometry


def test_filter_helpers(spark, features):
    pts = filter_by_type(features, "Point")
    assert pts.filter("geom_type != 'Point'").count() == 0
    sub = filter_by_props(features, {"kind": "city"})
    rows = sub.select("props").collect()
    assert all(r["props"]["kind"] == "city" for r in rows)


GRID_POLYS = []
for gx in range(-18, 18, 6):
    for gy in range(-9, 9, 6):
        GRID_POLYS.append(
            {
                "type": "Polygon",
                "coordinates": [
                    [
                        [gx * 10.0, gy * 10.0],
                        [gx * 10.0 + 20.0, gy * 10.0],
                        [gx * 10.0 + 20.0, gy * 10.0 + 20.0],
                        [gx * 10.0, gy * 10.0 + 20.0],
                        [gx * 10.0, gy * 10.0],
                    ]
                ],
            }
        )


def _poly_table(spark):
    # irregular polygons (with a hole) + the reference's dateline polygon, cut
    from picogeojson_spark.geo import cut_dateline, make_polygon, to_dict
    from picogeojson_spark.geo.codec import SerializeOptions

    opts = SerializeOptions(antimeridian_cutting=False, write_bbox=False)
    polys = []
    for i, g in enumerate(GRID_POLYS):
        polys.append((i, json.dumps(g)))
    hole_poly = {
        "type": "Polygon",
        "coordinates": [
            [[0, 0], [40, 0], [40, 40], [0, 40], [0, 0]],
            [[10, 10], [30, 10], [30, 30], [10, 30], [10, 10]],
        ],
    }
    polys.append((100, json.dumps(to_dict(kloads(json.dumps(hole_poly)), opts, root=False))))
    dateline = make_polygon(
        [[(172, -20), (-179, -20), (-177, -25), (172, -25), (172, -20)]]
    )
    polys.append((101, json.dumps(to_dict(cut_dateline(dateline), opts, root=False))))
    return spark.createDataFrame(polys, "poly_id long, geometry_json string")


def test_pip_join_matches_oracle(spark, features):
    points = (
        filter_by_type(features, "Point")
        .select(
            (F.pmod(features.doc_id, F.lit(2**40)) * 100 + features.feature_idx).alias("point_id"),
            "lon",
            "lat",
        )
        .cache()
    )
    polys = _poly_table(spark)
    got = {(r.point_id, r.poly_id) for r in pip_join(points, polys).collect()}

    pts = points.collect()
    xs = np.array([p.lon for p in pts])
    ys = np.array([p.lat for p in pts])
    pids = [p.point_id for p in pts]
    expected = set()
    for r in polys.collect():
        mask = points_in_geometry(xs, ys, json.loads(r.geometry_json))
        for i in np.nonzero(mask)[0]:
            expected.add((pids[int(i)], r.poly_id))
    assert got == expected
    assert len(expected) > 0


def test_tile_pyramid_rollup_equals_direct_assignment(spark):
    """The parent=child>>1 cascade must equal assigning tiles DIRECTLY at
    every zoom — including poles (mercator clamp), the dateline, and
    exact tile-boundary points."""
    import numpy as np

    from picogeojson_spark.operators.tiling import (
        assign_tiles_points,
        tile_pyramid,
    )

    rng = np.random.default_rng(5)
    lon = np.concatenate([rng.uniform(-180, 180, 4000),
                          [-180.0, 180.0, 0.0, 90.0, -90.0, 179.999]])
    lat = np.concatenate([rng.uniform(-90, 90, 4000),
                          [90.0, -90.0, 0.0, 85.06, -85.06, 66.6]])
    pts = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "point_id long, lon double, lat double",
    )
    got = {
        (r.tile_z, r.tile_x, r.tile_y): r.n_points
        for r in tile_pyramid(pts, z_min=3, z_max=9).collect()
    }
    want = {}
    for z in range(3, 10):
        for r in (assign_tiles_points(pts, z)
                  .groupBy("tile_z", "tile_x", "tile_y")
                  .agg(F.count("*").alias("n")).collect()):
            want[(r.tile_z, r.tile_x, r.tile_y)] = r.n
    assert got == want


def test_cell_expr_matches_numpy_kernel(spark):
    """The JVM cell expression must be BIT-identical to geo.cells.cell_of
    for every level pip_join uses — random lattice + the ±180/±90 edges
    (where floor lands exactly on nx/ny and the clip must engage)."""
    import numpy as np

    from picogeojson_spark.geo.cells import cell_of
    from picogeojson_spark.operators.pip_join import MIN_LEVEL, cell_expr

    rng = np.random.default_rng(11)
    lon = np.concatenate([
        rng.uniform(-180, 180, 20000),
        np.array([-180.0, 180.0, 0.0, -179.999999, 179.999999,
                  -1e-12, 1e-12, 45.5, -45.5, 179.5]),
    ])
    lat = np.concatenate([
        rng.uniform(-90, 90, 20000),
        np.array([-90.0, 90.0, 0.0, -89.999999, 89.999999,
                  -1e-12, 1e-12, 22.25, -22.25, 89.5]),
    ])
    pdf = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)],
        "lon double, lat double",
    )
    for lv in range(MIN_LEVEL, 11):
        got = np.array([
            r.c for r in pdf.select(
                cell_expr(F.col("lon"), F.col("lat"), lv).alias("c")
            ).collect()
        ])
        want = cell_of(lon, lat, lv)
        assert (got == want).all(), "level {} diverged".format(lv)


def test_point_ancestors_plan_has_no_python(spark, features):
    """The point side of pip_join must be pure codegen — no Python stage."""
    from picogeojson_spark.operators.pip_join import point_ancestors_df

    pts = spark.createDataFrame([(1, 10.0, 20.0)],
                                "point_id long, lon double, lat double")
    plan = point_ancestors_df(pts)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "MapInPandas" not in plan and "Python" not in plan


def test_pip_join_broadcast_autosizing(spark, features):
    """Default broadcast_polys=None sizes the cover side: a tiny polygon
    table gets the forced-broadcast plan (point side never shuffles), while
    one over the budget is left unhinted so AQE decides from runtime sizes
    — and the output is identical either way."""
    points = filter_by_type(features, "Point").select(
        (F.pmod(features.doc_id, F.lit(2**40)) * 100 + features.feature_idx).alias("point_id"),
        "lon",
        "lat",
    ).limit(120)
    polys = _poly_table(spark)

    auto_small = pip_join(points, polys)
    assert "ResolvedHint" in auto_small._jdf.queryExecution().analyzed().toString()

    # simulate the country-scale-table regime by zeroing the budget
    auto_big = pip_join(points, polys, broadcast_budget_bytes=0)
    assert "ResolvedHint" not in auto_big._jdf.queryExecution().analyzed().toString()

    forced = {(r.point_id, r.poly_id)
              for r in pip_join(points, polys, broadcast_polys=True).collect()}
    assert {(r.point_id, r.poly_id) for r in auto_big.collect()} == forced
    assert {(r.point_id, r.poly_id) for r in auto_small.collect()} == forced
    assert len(forced) > 0


def test_pip_join_salted_equals_plain(spark, features):
    points = filter_by_type(features, "Point").select(
        (F.pmod(features.doc_id, F.lit(2**40)) * 100 + features.feature_idx).alias("point_id"),
        "lon",
        "lat",
    )
    polys = _poly_table(spark)
    plain = {(r.point_id, r.poly_id) for r in pip_join(points, polys).collect()}
    salted = {
        (r.point_id, r.poly_id)
        for r in pip_join(points, polys, salt=4, broadcast_polys=False).collect()
    }
    assert plain == salted


def test_knn_matches_bruteforce(spark, features):
    pts = (
        filter_by_type(features, "Point")
        .select(
            (F.pmod(features.doc_id, F.lit(2**40)) * 100 + features.feature_idx).alias("point_id"),
            "lon",
            "lat",
        )
        .limit(150)
        .cache()
    )
    queries = pts.select(pts.point_id.alias("query_id"), "lon", "lat")
    cands = pts.select(pts.point_id.alias("neighbor_id"), "lon", "lat")
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in knn_join(queries, cands, k=3, level=6, radius=1).collect()
    }

    # the scale tail (query-side ring expansion) must be exactly as correct
    # as the small-scale direct-brute tail: force it by zeroing the budget
    expanded = {
        (r.query_id, r.rank): r.neighbor_id
        for r in knn_join(queries, cands, k=3, level=6, radius=1,
                          brute_pairs_budget=0).collect()
    }
    assert expanded == got

    # lifecycle: the default (localCheckpoint) mode must not register
    # anything in the SQL CacheManager — that registry pins plans until an
    # explicit unpersist, which is exactly the long-lived-session leak.
    # (pts.cache() above is RDD-level via DataFrame.cache -> clear it first
    # to make the manager state unambiguous.)
    pts.unpersist()
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    cache_mgr.clearCache()
    knn_join(queries, cands, k=3, level=6, radius=1).count()
    assert cache_mgr.isEmpty(), "default knn_join must not pin a cache entry"
    # persist mode trades that safety for speed and must hand the caller
    # the cleanup handle
    cached = knn_join(queries, cands, k=3, level=6, radius=1, cache="persist")
    cached.count()
    assert not cache_mgr.isEmpty()
    assert cached._knn_cached is not None
    cached._knn_cached.unpersist()
    assert cache_mgr.isEmpty()

    rows = pts.collect()
    expected = {}
    for q in rows:
        dists = sorted(
            ((q.lon - c.lon) ** 2 + (q.lat - c.lat) ** 2, c.point_id) for c in rows
        )
        for rank, (_, nid) in enumerate(dists[:3], start=1):
            expected[(q.point_id, rank)] = nid
    assert got == expected


def _brute_knn(qs, cs, k):
    """Python oracle: dist2 asc, neighbor_id asc, top-k per query."""
    out = {}
    for qid, qlon, qlat in qs:
        scored = sorted(
            ((qlon - clon) ** 2 + (qlat - clat) ** 2, nid) for nid, clon, clat in cs
        )
        for rank, (d2, nid) in enumerate(scored[:k], start=1):
            out[(qid, rank)] = nid
    return out


def test_knn_wide_ring_wrap_no_duplicates(spark):
    # regression (ADVICE r2): at a coarse level the expansion ring can exceed
    # the grid width (level=2 -> nx=8; two doublings reach radius 4, ring
    # width 9). Un-capped pmod offsets then map two offsets to the same cell,
    # duplicating (query, neighbor) pairs and corrupting the top-k.
    qs = [(i, -170.25 + 3.0 * i, 10.25) for i in range(6)]
    cs = [(100, 150.25, -60.25), (101, 100.25, 50.25),
          (102, 0.25, 0.25), (103, -90.25, 80.25), (104, 179.25, -10.25)]
    queries = spark.createDataFrame(qs, "query_id long, lon double, lat double")
    cands = spark.createDataFrame(cs, "neighbor_id long, lon double, lat double")
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in knn_join(queries, cands, k=3, level=2, radius=1,
                          brute_pairs_budget=0, max_expansions=2).collect()
    }
    assert got == _brute_knn(qs, cs, 3)


def test_knn_full_coverage_keeps_unsettled_queries(spark):
    # regression (ADVICE r2): with fewer candidates than k no query ever
    # "settles" (found < k); once the expansion ring covers the whole planet
    # the result is globally exact and must be returned — the old break
    # dropped these queries from the output entirely.
    qs = [(i, -120.25 + 40.0 * i, -30.25 + 20.0 * i) for i in range(4)]
    cs = [(100, 10.25, 10.25), (101, -170.25, 60.25), (102, 90.25, -70.25)]
    queries = spark.createDataFrame(qs, "query_id long, lon double, lat double")
    cands = spark.createDataFrame(cs, "neighbor_id long, lon double, lat double")
    rows = knn_join(queries, cands, k=5, level=2, radius=1,
                    brute_pairs_budget=0, max_expansions=3).collect()
    got = {(r.query_id, r.rank): r.neighbor_id for r in rows}
    assert got == _brute_knn(qs, cs, 5)  # every query, all 3 neighbours
    assert len(rows) == len(qs) * len(cs)


def test_tile_assignment_points(spark, features):
    pts = filter_by_type(features, "Point").select("doc_id", "feature_idx", "lon", "lat")
    got = assign_tiles_points(pts, z=10).collect()
    from picogeojson_spark.geo.tiles import tile_xy

    for r in got:
        x, y = tile_xy(np.array([r.lon]), np.array([r.lat]), 10)
        assert (r.tile_x, r.tile_y) == (int(x[0]), int(y[0])), (r.lon, r.lat)
