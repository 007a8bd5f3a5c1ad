#!/usr/bin/env python
"""Skew-join experiment (VERDICT r5 #6): measure plain SMJ vs AQE skew
splitting vs explicit salting on a synthetic hot-key join where ONE key
carries 30% of the fact rows. Results are recorded in NOTES_r6.md.

Shape: fact = sf1 lineitem (6M rows) keyed so that l_orderkey % 10 < 3
collapses onto key 0 (1.8M rows on one key) and the rest spread over
50k keys; dim = the 50k keys with a payload. Broadcast is disabled on
every arm (the dim fits in memory at this scale, which would turn the
join into a broadcast hash join and make skew invisible — at the real
scale the dim side is too big to broadcast, which is exactly when skew
bites). AQE's skew thresholds are lowered proportionally to the local
data size (the defaults — 256 MB partitions — are tuned for cluster
scale and would never trigger on a 200 MB local shuffle; the RATIO of
the three arms, not the absolute seconds, is the transferable result).

Usage: python scripts/skew_bench.py [sf_dir] (default .localdata/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators.skew import (
    salted_join,
)
from sec_financial_data_pipeline_using_snowflake_dbt_spark.session import get_spark

REPS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
    spark = get_spark("skew-bench")
    # no broadcast on any arm: skew only exists in shuffle joins
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # local-scale AQE skew thresholds (defaults are cluster-sized:
    # 256 MB threshold / 64 MB advisory would never trigger on a
    # ~14 MB compressed local shuffle — and this synthetic data
    # compresses ~10x, so BYTE-based detection needs the bar this low
    # even though the hot partition holds 14x the median's ROWS)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 3, F.lit(0))
        .otherwise(F.pmod(F.col("l_orderkey"), F.lit(50000)))
        .cast("long")
        .alias("k"),
        "l_quantity",
        "l_extendedprice",
    )
    dim = spark.range(50000).select(
        F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("weight")
    )
    # 16 output files => >=16 map tasks feeding the join shuffle. AQE's
    # skew split is MAP-CHUNK granular (PartialReducerPartitionSpec
    # groups map indices): a single-row-group input gives the shuffle
    # ONE map with data, and an unsplittable hot partition — AQE
    # detects the skew but createSkewPartitionSpecs returns None
    # (diagnosed r6; per-map probe showed [3.8MB, 0, 0, 0, 0]).
    fact.repartition(16).write.mode("overwrite").parquet(
        "/root/repo/.localdata/skew_fact.parquet"
    )
    dim.write.mode("overwrite").parquet("/root/repo/.localdata/skew_dim.parquet")
    fact = spark.read.parquet("/root/repo/.localdata/skew_fact.parquet")
    dim = spark.read.parquet("/root/repo/.localdata/skew_dim.parquet")

    def agg(j):
        return j.agg(F.sum(F.col("l_extendedprice") * F.col("weight")).alias("s"))

    def run(name, thunk):
        best, val = float("inf"), None
        for _ in range(REPS):
            t0 = time.perf_counter()
            val = thunk().collect()[0].s
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.2f}s  checksum={val}", flush=True)
        return best

    def with_skew(enabled, thunk):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(enabled).lower())
        try:
            return thunk()
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    results = {
        "plain_smj": run(
            "plain SMJ (AQE skew off)",
            lambda: with_skew(False, lambda: agg(fact.join(dim, "k"))),
        ),
        "aqe_skew": run(
            "AQE skew join", lambda: with_skew(True, lambda: agg(fact.join(dim, "k")))
        ),
        "salted_32": run(
            "salted_join buckets=32",
            lambda: with_skew(
                False, lambda: agg(salted_join(fact, dim, "k", buckets=32))
            ),
        ),
    }
    import json

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
