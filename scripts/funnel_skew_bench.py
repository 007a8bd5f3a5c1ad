#!/usr/bin/env python
"""Hot-user skew experiment for the event operators (VERDICT r7 #7):
measure the production min-groupBy per-user reductions in
funnel_steps / retention_cohorts against the rank-window formulation
they deliberately avoid, on a bot-shaped event table where 1% of the
users carry 90% of the events.

Why this shape: funnel/retention per-user reductions need "first event
per user". Two spellings exist —

- min-groupBy (production): ``groupBy(u).agg(min(t))`` — map-side
  partial aggregation collapses each hot user to ONE row per input
  partition before the shuffle, so a bot with millions of events ships
  ~n_partitions rows;
- rank-window (the anti-pattern): ``row_number() OVER (PARTITION BY u
  ORDER BY t) = 1`` — every event of the hot user lands in one window
  partition and gets SORTED there; the skewed partition is the stage's
  critical path and AQE cannot split a window partition.

Results land in NOTES_r8. Usage:
  python scripts/funnel_skew_bench.py [n_events] [n_users]
(defaults 4_000_000 events / 10_000 users; hot 1% of users share 90%
of events round-robin).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators import (
    funnel as FUN,
)
from sec_financial_data_pipeline_using_snowflake_dbt_spark.session import get_spark

REPS = 3
STEPS = ["view", "click", "purchase"]


def synth_events(spark, n_events: int, n_users: int) -> DataFrame:
    """Deterministic bot-skewed events: ids 0..n_hot-1 (1% of users)
    take 90% of events round-robin; the rest spread uniformly. Event
    types cycle view/click/purchase with timestamps that complete
    funnels for a deterministic subset."""
    n_hot = max(1, n_users // 100)
    hot_cut = int(n_events * 0.9)
    return spark.range(n_events).select(
        F.when(
            F.col("id") < hot_cut, F.col("id") % n_hot
        ).otherwise(n_hot + (F.col("id") * 2654435761) % (n_users - n_hot))
        .alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_600_000_000) + (F.col("id") % 86_400)
        ).alias("ts"),
        F.element_at(
            F.array(*[F.lit(s) for s in STEPS]),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
    )


def rank_window_funnel(events: DataFrame, steps: list[str]) -> DataFrame:
    """The formulation funnel_steps avoids: per-step 'first qualifying
    event per user' via row_number windows over the user partition."""
    ev = events.select("user_id", "ts", "event_type").filter(
        F.col("ts").isNotNull() & F.col("event_type").isin(steps)
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    first = (
        ev.filter(F.col("event_type") == steps[0])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("t_prev"), F.col("ts").alias("t1"))
    )
    reached = first
    per_step = [reached.select("user_id")]
    bound = F.expr("INTERVAL 7 days")
    for name in steps[1:]:
        nxt = (
            ev.filter(F.col("event_type") == name)
            .join(reached, "user_id")
            .filter(
                (F.col("ts") >= F.col("t_prev"))
                & (F.col("ts") <= F.col("t1") + bound)
            )
            .withColumn(
                "rn",
                F.row_number().over(Window.partitionBy("user_id").orderBy("ts")),
            )
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("ts").alias("t_prev"), "t1")
        )
        reached = nxt
        per_step.append(reached.select("user_id"))
    counts = None
    for i, users in enumerate(per_step):
        c = users.agg(
            F.lit(i + 1).cast("long").alias("step"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts


def rank_window_first_seen(events: DataFrame) -> DataFrame:
    """retention's per-user first-week reduction via the rank window."""
    ev = events.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk")
    ).filter(F.col("wk").isNotNull())
    w = Window.partitionBy("user_id").orderBy("wk")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("wk").alias("cohort_week"))
    )


def min_groupby_first_seen(events: DataFrame) -> DataFrame:
    ev = events.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk")
    ).filter(F.col("wk").isNotNull())
    return ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))


def best_of(fn, reps: int = REPS) -> float:
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark("funnel-skew-bench")
    ev = synth_events(spark, n_events, n_users).persist()
    print(f"events={ev.count():,} users~{n_users:,} (1% hot / 90% of events)")

    arms = {
        "funnel_min_groupby": lambda: FUN.funnel_steps(
            ev, STEPS, persist_filtered=False
        ).collect(),
        "funnel_rank_window": lambda: rank_window_funnel(ev, STEPS).collect(),
        "retention_min_groupby": lambda: min_groupby_first_seen(ev).count(),
        "retention_rank_window": lambda: rank_window_first_seen(ev).count(),
    }
    out = {}
    for name, fn in arms.items():
        out[name] = round(best_of(fn), 3)
        print(f"{name}: {out[name]} s (best of {REPS})")
    # cross-arm agreement (the anti-pattern is slow, not wrong)
    a = {
        (r.step, r.n_users)
        for r in FUN.funnel_steps(ev, STEPS, persist_filtered=False).collect()
    }
    b = {(r.step, r.n_users) for r in rank_window_funnel(ev, STEPS).collect()}
    assert a == b, (sorted(a), sorted(b))
    print("arms agree on funnel counts:", sorted(a))
    import json

    print(json.dumps({"n_events": n_events, "n_users": n_users, **out}))


if __name__ == "__main__":
    main()
