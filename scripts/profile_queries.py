#!/usr/bin/env python
"""Per-query optimization profiler (guide §1: measure first).

For every HEADLINE query (or $SPARK_GRAFT_BENCH_QUERIES subset) report:

- build_s: time spent in ``QUERIES[name](spark, sf_dir)`` — driver-side
  work at plan-construction time (collect jobs for iterative operators,
  persist materializations, literal baking);
- force_s: time of the noop-sink action (guide §1.4);
- jobs: Spark job count the query triggered end-to-end (build + force)
  via setJobGroup/statusTracker — the fixed-overhead currency at bench
  scale (each local job costs ~50-300 ms of scheduling + stage latency
  regardless of data volume);
- plan: ``explain("formatted")`` written to plans/<outdir>/<name>_<tag>.txt
  with Exchange / *EvalPython / join-node counts summarized.

Usage:
  python scripts/profile_queries.py [tag] [outdir]    # default: before plans/r11
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from sec_financial_data_pipeline_using_snowflake_dbt_spark.session import (  # noqa: E402
    get_spark,
)
from sec_financial_data_pipeline_using_snowflake_dbt_spark.workload import (  # noqa: E402
    QUERIES,
)


def plan_counts(plan: str) -> dict[str, int]:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sortmerge": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", plan)),
        "pyeval": len(re.findall(r"EvalPython|MapInPandas|MapInArrow", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "plans/r11"
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = [q for q in HEADLINE if q in only.split(",")] if only else HEADLINE

    spark = get_spark("secspark-profile")
    sc = spark.sparkContext
    from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators import (
        dedup as DD,
    )

    # warm-up (mirror bench.py)
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    QUERIES["q_distinct"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    rows = []
    for name in names:
        best = None
        for rep in range(reps):
            group = f"{name}#{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            if rep == 0:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
                    fh.write(plan)
                counts = plan_counts(plan)
            DD.release_dedup_caches()
            spark.catalog.clearCache()
            cur = {
                "build_s": round(t1 - t0, 3),
                "force_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "jobs": jobs,
            }
            if best is None or cur["total_s"] < best["total_s"]:
                best = cur
        best.update(counts)
        best["name"] = name
        rows.append(best)
        print(json.dumps(best), flush=True)

    rows.sort(key=lambda r: -r["total_s"])
    print("\n== sorted by total_s ==")
    hdr = ["name", "total_s", "build_s", "force_s", "jobs", "exchanges",
           "scans", "sortmerge", "bhj", "bnlj", "pyeval"]
    print("  ".join(hdr))
    for r in rows:
        print("  ".join(str(r[h]) for h in hdr))
    with open(os.path.join(outdir, f"profile_{tag}.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
