#!/usr/bin/env python
"""Timestamped breakdown of the ANN family's driver-side build phase
(guide §1: measure before touching VERDICT r11 #3). Monkeypatches
DataFrame.collect / createDataFrame / the noop force with timers so
every driver-blocking step inside QUERIES[name](spark, sf_dir) shows
up with its duration and the first line of the calling frame.

Usage: python scripts/ann_build_breakdown.py [q_ann_ivf,q_ann_ivfpq,...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark 4: the session hands out pyspark.sql.classic.dataframe.DataFrame,
# which OVERRIDES collect — patch the concrete class, not the ABC
try:
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # older layouts
    from pyspark.sql import DataFrame

from sec_financial_data_pipeline_using_snowflake_dbt_spark.session import get_spark
from sec_financial_data_pipeline_using_snowflake_dbt_spark.workload import QUERIES
from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators import dedup as DD

EVENTS: list[tuple[str, str, float]] = []


def _caller() -> str:
    for fr in reversed(traceback.extract_stack(limit=12)[:-2]):
        if "site-packages" not in fr.filename:
            return f"{os.path.basename(fr.filename)}:{fr.lineno}"
    return "?"


_oc = DataFrame.collect
_ock = DataFrame.localCheckpoint


def _tcollect(self):
    t = time.perf_counter()
    r = _oc(self)
    EVENTS.append(("collect", _caller(), time.perf_counter() - t))
    return r


def _tck(self, eager=True):
    t = time.perf_counter()
    r = _ock(self, eager)
    EVENTS.append(("localCheckpoint", _caller(), time.perf_counter() - t))
    return r


DataFrame.collect = _tcollect
DataFrame.localCheckpoint = _tck


def main() -> None:
    names = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else ["q_ann_ivf", "q_ann_ivfpq", "q_ann_ivfpq_res", "q_kmeans_quality"]
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus)
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    _ocdf = spark.createDataFrame

    def _tcdf(*a, **k):
        t = time.perf_counter()
        r = _ocdf(*a, **k)
        EVENTS.append(("createDataFrame", _caller(), time.perf_counter() - t))
        return r

    spark.createDataFrame = _tcdf
    for name in names:
        for rep in range(2):
            EVENTS.clear()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            force = time.perf_counter() - t1
            DD.release_dedup_caches()
            spark.catalog.clearCache()
            print(f"\n{name} rep{rep}: build={build:.3f} force={force:.3f}")
            for kind, where, dur in EVENTS:
                print(f"   {dur:7.3f}  {kind:16s} {where}")
            acct = build - sum(d for _, _, d in EVENTS)
            print(f"   {acct:7.3f}  (plan construction / other driver work)")
    spark.stop()


if __name__ == "__main__":
    main()
