"""compaction_plan: sorted-next-fit packing semantics on crafted manifests."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, rows, target):
    from picogeojson_spark.operators.maintenance import compaction_plan

    df = spark.createDataFrame(rows, "part long, file_id long, bytes long")
    out = compaction_plan(df, target_bytes=target).collect()
    return {(r.part, r.file_id): r for r in out}


def test_prefix_sum_packing(spark):
    rows = [(1, 1, 500), (1, 2, 400), (1, 3, 300), (1, 4, 300), (1, 5, 200)]
    got = _run(spark, rows, target=1000)
    # sort desc by size, file_id asc tie-break: 500,400,300(3),300(4),200
    # cumsum-before: 0,500,900,1200,1500 -> bins 0,0,0,1,1
    assert [got[(1, f)].bin for f in (1, 2, 3, 4, 5)] == [0, 0, 0, 1, 1]
    assert got[(1, 1)].n_in_bin == 3 and got[(1, 1)].bin_bytes == 1200
    assert got[(1, 5)].n_in_bin == 2 and got[(1, 5)].bin_bytes == 500
    assert all(r.action == "compact" for r in got.values())


def test_large_files_kept_out(spark):
    rows = [(1, 1, 1000), (1, 2, 1500), (1, 3, 100)]
    got = _run(spark, rows, target=1000)
    assert got[(1, 1)].action == "keep" and got[(1, 1)].bin is None
    assert got[(1, 2)].action == "keep"
    assert got[(1, 3)].action == "compact" and got[(1, 3)].bin == 0
    assert got[(1, 1)].n_in_bin is None and got[(1, 1)].bin_bytes is None


def test_partitions_pack_independently(spark):
    rows = [(1, 1, 600), (1, 2, 600), (2, 1, 600), (2, 2, 600)]
    got = _run(spark, rows, target=1000)
    # each partition: before 0,600 -> bins 0,0 (never mixes partitions)
    assert all(got[k].bin == 0 for k in got)
    assert all(got[k].n_in_bin == 2 for k in got)


def test_equal_size_tie_breaks_by_file_id(spark):
    # pack order 900, 300(id3), 300(id7): the boundary falls between the
    # equal-size pair, and the LOWER file_id takes the earlier bin.
    rows = [(1, 1, 900), (1, 7, 300), (1, 3, 300)]
    got = _run(spark, rows, target=1000)
    assert got[(1, 1)].bin == 0
    assert got[(1, 3)].bin == 0 and got[(1, 7)].bin == 1


def test_bounded_waste_invariant(spark):
    rows = [(1, i, 100 + 37 * (i % 9)) for i in range(60)]
    target = 1000
    got = _run(spark, rows, target=target)
    by_bin = {}
    for r in got.values():
        by_bin.setdefault(r.bin, 0)
        by_bin[r.bin] += r.bytes
    order = sorted(by_bin)
    # every bin < 2*target; every k-bin prefix holds >= k*target; bin
    # count within one of the volume bound ceil(total/target).
    assert all(by_bin[b] < 2 * target for b in order)
    cum = 0
    for i, b in enumerate(order[:-1]):
        cum += by_bin[b]
        assert cum >= (i + 1) * target
    total = sum(b for _, _, b in rows)
    assert len(order) <= -(-total // target) + 1
