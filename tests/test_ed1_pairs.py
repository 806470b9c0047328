"""ed1_pairs: deletion-block completeness vs brute levenshtein."""

from picogeojson_spark.operators.dedup import ed1_pairs

SCHEMA = "doc_id long, name string"


def _run(spark, rows):
    got = ed1_pairs(spark.createDataFrame(rows, SCHEMA)).collect()
    return {(r.id_a, r.id_b): r.ed for r in got}


def _lev(a, b):
    n, m = len(a), len(b)
    D = list(range(m + 1))
    for i in range(1, n + 1):
        prev, D[0] = D[0], i
        for j in range(1, m + 1):
            cur = D[j]
            D[j] = min(D[j] + 1, D[j - 1] + 1,
                       prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return D[m]


def _brute(rows):
    out = {}
    for i, (ia, na) in enumerate(rows):
        for ib, nb in rows[i + 1:]:
            lo, hi = min(ia, ib), max(ia, ib)
            d = _lev(na, nb)
            if d <= 1:
                out[(lo, hi)] = d
    return out


def test_substitution_insertion_deletion_and_exact(spark):
    rows = [(1, "cat"), (2, "cut"), (3, "cats"), (4, "at"),
            (5, "cat"), (6, "dog")]
    got = _run(spark, rows)
    assert got[(1, 2)] == 1      # substitution
    assert got[(1, 3)] == 1      # insertion
    assert got[(1, 4)] == 1      # deletion
    assert got[(1, 5)] == 0      # exact duplicate
    assert all(6 not in p for p in got)
    assert got == _brute(rows)


def test_distance_two_excluded(spark):
    rows = [(1, "abcd"), (2, "axyd")]
    assert _run(spark, rows) == {}


def test_empty_and_single_char(spark):
    rows = [(1, ""), (2, "a"), (3, "b"), (4, "")]
    got = _run(spark, rows)
    assert got == _brute(rows)
    assert got[(1, 2)] == 1 and got[(2, 3)] == 1 and got[(1, 4)] == 0


def test_double_letter_dedup_single_key(spark):
    # "aab": deleting either 'a' gives "ab" — variant dedup must not
    # double-count the pair.
    rows = [(1, "aab"), (2, "ab")]
    assert _run(spark, rows) == {(1, 2): 1}


def test_brute_differential_supplier_like(spark):
    rows = [(i, "Supplier#%09d" % ((i * 7) % 40)) for i in range(60)]
    assert _run(spark, rows) == _brute(rows)
