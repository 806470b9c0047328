"""attach_scalar (_util) + the gate's structural BNLJ verification:
bounded build sides pass, unbounded ones raise / are rejected — the
round-5 replacement for the 15-name PLAN_ALLOW_CROSS scalar allowlist."""

import os
import sys

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators._util import attach_scalar

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

pytestmark = pytest.mark.usefixtures("spark")


def test_attach_scalar_values_and_plan(spark):
    big = spark.range(100).withColumnRenamed("id", "x")
    scalar = big.agg(F.sum("x").cast("long").alias("total"))
    out = attach_scalar(big, scalar)
    rows = out.collect()
    assert len(rows) == 100 and all(r.total == 4950 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the sanctioned shape IS a BNLJ — over a 1-row broadcast
    assert "BroadcastNestedLoopJoin" in plan


def test_attach_scalar_rejects_unbounded_side(spark):
    big = spark.range(100).withColumnRenamed("id", "x")
    grouped = big.groupBy((F.col("x") % 7).alias("g")).count()
    with pytest.raises(ValueError, match="not provably"):
        attach_scalar(big, grouped)
    # a bounded-but-too-big side is also rejected at the default bound
    with pytest.raises(ValueError):
        attach_scalar(big, spark.range(5))
    # ...but admitted when the caller raises the bound explicitly
    assert attach_scalar(big, spark.range(5), max_build_rows=5).count() == 500


def test_attach_scalar_accepts_derived_scalar_shapes(spark):
    big = spark.range(100).withColumnRenamed("id", "x")
    s1 = big.agg(F.count("*").alias("n")).select((F.col("n") * 2).alias("n2"))
    s2 = s1.crossJoin(big.agg(F.max("x").alias("mx")))  # join of scalars
    out = attach_scalar(big, s2).collect()
    assert all(r.n2 == 200 and r.mx == 99 for r in out)


def test_gate_validator_accepts_scalar_attach_plan(spark):
    from check_correctness import bnlj_all_scalar_attach

    big = spark.range(100).withColumnRenamed("id", "x")
    scalar = big.agg(F.sum("x").alias("total"))
    df = attach_scalar(big, scalar)
    df.collect()  # finalize AQE so the Final Plan section exists
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert bnlj_all_scalar_attach(plan)


def test_gate_validator_rejects_nonscalar_bnlj(spark):
    from check_correctness import bnlj_all_scalar_attach

    big = spark.range(100).withColumnRenamed("id", "x")
    small = spark.range(6).withColumnRenamed("id", "y")  # NOT an aggregate
    df = big.crossJoin(F.broadcast(small))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "BroadcastNestedLoopJoin" in plan:
        assert not bnlj_all_scalar_attach(plan)
    # a theta-join spelling must be rejected too
    theta = big.join(F.broadcast(small), big.x > small.y)
    theta.collect()
    plan2 = theta._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan2
    assert not bnlj_all_scalar_attach(plan2)
