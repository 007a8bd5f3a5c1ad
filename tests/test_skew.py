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


def test_salted_join_exact_and_spread(spark, skewed):
    """salted_join matches the plain join exactly (inner + left) and
    actually spreads the hot key across salt buckets."""
    from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators.skew import (
        deterministic_salt,
        salted_join,
    )

    facts, dim = skewed
    plain = facts.join(dim, "k").groupBy("name").agg(F.count(F.lit(1)).alias("n"))
    salted = (
        salted_join(facts, dim, on="k", buckets=8)
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r.name, r.n) for r in salted.collect()} == {
        (r.name, r.n) for r in plain.collect()
    }
    # left join keeps unmatched fact rows exactly once
    dim_partial = dim.filter(F.col("k") < 50)
    left_plain = facts.join(dim_partial, "k", "left").count()
    left_salted = salted_join(facts, dim_partial, on="k", buckets=8, how="left").count()
    assert left_salted == left_plain == facts.count()
    # the hot key's rows really land in multiple salt buckets
    spread = (
        facts.filter(F.col("k") == 7)
        .select(deterministic_salt([F.col("k"), F.col("v")], 8).alias("s"))
        .distinct()
        .count()
    )
    assert spread > 1


def test_keep_canonical_end_to_end(spark):
    """pairs → clusters → keep_canonical keeps exactly one doc per
    component plus all singletons."""
    from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators import (
        dedup as DD,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 6)], "id_a long, id_b long"
    )
    clusters = DD.dedup_clusters(pairs, nodes=docs.select("doc_id"))
    kept = sorted(r.doc_id for r in DD.keep_canonical(docs, clusters).collect())
    assert kept == [0, 1, 2, 4, 7]  # 3,5 fold into 1; 6 into 2
    # clusters came from nodes=docs — full coverage, so the
    # clusters_cover_docs fast path (no singleton anti-join) must be
    # row-identical (r12: the pipeline composition takes it)
    fast = sorted(
        r.doc_id
        for r in DD.keep_canonical(
            docs, clusters, clusters_cover_docs=True
        ).collect()
    )
    assert fast == kept
    best = sorted(
        r.doc_id
        for r in DD.keep_best(
            docs.withColumn("score", F.col("doc_id") % 3),
            clusters,
            "score",
            clusters_cover_docs=True,
        ).collect()
    )
    assert best == sorted(
        r.doc_id
        for r in DD.keep_best(
            docs.withColumn("score", F.col("doc_id") % 3), clusters, "score"
        ).collect()
    )
