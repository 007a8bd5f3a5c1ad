"""Skewed-join posture: a join with one pathological hot key completes
under AQE and produces exact results (the adsh-skew scenario from
FIXTURES.md at fact-table scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # 200k rows, 99% on one hot key; dimension of 100 keys
    facts = spark.range(0, 200_000).select(
        F.when(F.col("id") % 100 == 0, (F.col("id") / 100) % 100)
        .otherwise(F.lit(7))
        .cast("long")
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    return facts, dim


def test_skewed_join_exact(spark, skewed):
    facts, dim = skewed
    joined = facts.join(dim, "k").groupBy("name").agg(F.count(F.lit(1)).alias("n"))
    rows = {r.name: r.n for r in joined.collect()}
    # hot key carries 99% of rows + its 1-in-100 stripe share
    assert rows["name_7"] == facts.filter(F.col("k") == 7).count()
    assert sum(rows.values()) == 200_000


def test_skew_split_with_forced_smj(spark, skewed):
    """Force a sort-merge join (no broadcast escape hatch) so AQE's
    skew-join handling is actually on the path, and verify exactness."""
    facts, dim = skewed
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    try:
        joined = facts.hint("merge").join(dim.hint("merge"), "k")
        assert joined.count() == 200_000
    finally:
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
