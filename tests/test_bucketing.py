"""Bucketed materialization removes the shuffle from joins on the
bucket keys — the cluster_by/X7 scale analogue."""

from __future__ import annotations

import pytest

from sec_financial_data_pipeline_using_snowflake_dbt_spark.sources.catalog import (
    materialize,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    ob = materialize(o, "orders_bkt", "table", bucket_by=(8, ["o_orderkey"]))
    lb = materialize(
        l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_bkt",
        "table",
        bucket_by=(8, ["o_orderkey"]),
    )
    return ob, lb


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    ob, lb = bucketed
    joined = lb.join(ob.hint("merge"), "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]


def test_bucketed_join_correct(spark, bucketed):
    ob, lb = bucketed
    got = lb.join(ob, "o_orderkey").count()
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    exp = l.join(o, l.l_orderkey == o.o_orderkey).count()
    assert got == exp


def test_clustered_parquet_roundtrip(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    out = materialize(o, "orders_clustered", "table", warehouse_dir=wh,
                      cluster_by=["o_custkey"])
    assert out.count() == o.count()
