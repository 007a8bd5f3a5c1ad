"""As-of join — an operator Spark lacks natively (SURVEY §2.3 notes the
reference has no theta/as-of joins either; this is engine completeness
for time-series workloads).

Three implementations with identical semantics — for each left ROW
(duplicates preserved), the right row with the greatest ``on`` at or
before the left's ``on``, matching ``by``; ties on the timestamp are
broken to ONE whole right row, the one with the lexicographically
greatest ``value_cols`` tuple; unmatched left rows keep NULLs:

- ``asof_join``          — range join + one max-of-struct aggregate.
  Catalyst-visible, no Python. The range join fans out per key (every
  left row meets every earlier right row of its key), so it's the
  small/medium-per-key default.
- ``asof_join_bucketed`` — time-bucketized: same-bucket candidates via
  an equi-join on (key, bucket) + earlier-bucket candidates via a
  running max over per-bucket summaries. Fan-out is bounded by the
  bucket width instead of the whole key history — the 100 TB path.
- ``asof_join_pandas``   — ``applyInPandas`` per key group using
  ``pd.merge_asof`` (sorted-merge, O(n+m) per group). Wins when a
  whole key's data fits one task and Python batch overhead amortizes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _right_struct(on: str, value_cols: list[str], prefix: str = "") -> Column:
    """Comparable candidate: (on, *value_cols). Struct max = latest
    timestamp, ties broken by the greatest value tuple — one whole row."""
    return F.struct(
        F.col(f"{prefix}{on}").alias("__on"),
        *[F.col(f"{prefix}{c}").alias(f"__v_{c}") for c in value_cols],
    )


def _expand_best(
    df: DataFrame, left_cols: list[str], on: str, value_cols: list[str], suffix: str
) -> DataFrame:
    return df.select(
        *left_cols,
        F.col("__best.__on").alias(f"{on}{suffix}"),
        *[F.col(f"__best.__v_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Range-join formulation: one left join + one max-of-struct agg.

    A ``__rid`` row id keys the aggregate, so duplicate left rows are
    preserved (each gets its own match), and the max is over a single
    struct — one whole right row, never a column-wise mix.
    """
    lc = list(left.columns)
    l = left.withColumn("__rid", F.monotonically_increasing_id()).alias("l")
    r = right.select(by, on, *value_cols).alias("r")
    cond = (F.col(f"l.{by}") == F.col(f"r.{by}")) & (
        F.col(f"r.{on}") <= F.col(f"l.{on}")
    )
    cand = F.when(F.col(f"r.{on}").isNotNull(), _right_struct(on, value_cols, "r."))
    best = (
        l.join(r, cond, "left")
        .groupBy(F.col("l.__rid"), *[F.col(f"l.{c}") for c in lc])
        .agg(F.max(cand).alias("__best"))
    )
    return _expand_best(best, lc, on, value_cols, suffix)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Time-bucketized as-of join — the scale path.

    Both sides get ``bkt = floor(epoch(on) / bucket_seconds)``. A right
    row can best-match a left row either (a) in the SAME bucket — found
    by an equi-join on (by, bkt) + the ``r.on <= l.on`` filter, fan-out
    bounded by per-bucket right rows instead of the whole key history —
    or (b) in an EARLIER bucket — in which case only the latest right
    row per (by, bkt) can win, so we reduce right to per-bucket
    summaries and take a running max over buckets (a window over
    #buckets rows per key, not #rows). Bucketing by truncated epoch
    seconds is order-preserving across buckets (bkt(r) < bkt(l) ⇒
    r.on < l.on), so the union of (a) and (b) is EXACT, not heuristic.

    Every join is an equi-join; no per-key quadratic stage. Pick
    ``bucket_seconds`` ≈ the median right-side inter-arrival × desired
    fan-out (too fine → more summary rows; too coarse → (a) degenerates
    toward the range join).

    The left side appears in exactly ONE plan subtree and is touched by
    exactly ONE join + ONE groupBy: the earlier-bucket prefix summaries
    are folded into the CANDIDATE side (as pseudo-candidates keyed by
    the left bucket that needs them) before the join, so there is no
    second join back onto the (full-size) left relation, and the
    nondeterministic ``__rid`` is generated and consumed in a single
    evaluation (never compared across independently recomputed
    subtrees — ADVICE r2). The left-bucket markers that position the
    prefix rows are derived from ``left``'s deterministic (by, bucket)
    columns only.
    """
    lc = list(left.columns)
    bkt = F.floor(F.unix_timestamp(F.col(on)) / F.lit(bucket_seconds))
    l = (
        left.withColumn("__rid", F.monotonically_increasing_id())
        .withColumn("__bkt", bkt)
        .alias("l")
    )
    r = (
        right.select(by, on, *value_cols)
        .filter(F.col(on).isNotNull())
        .withColumn("__bkt", bkt)
        .alias("r")
    )

    # (b) earlier-bucket pseudo-candidates, computed on the SMALL side:
    # per-(by, bucket) right summaries, running-max'd over buckets and
    # aligned to each left bucket that needs them. Row count ≤ #distinct
    # (by, bucket) pairs — summary-scale, not data-scale.
    summaries = (
        r.groupBy(F.col(f"r.{by}").alias(by), F.col("r.__bkt").alias("__bkt"))
        .agg(F.max(_right_struct(on, value_cols, "r.")).alias("__s"))
        .withColumn("__side", F.lit(1))
    )
    left_buckets = (
        left.select(F.col(by), bkt.alias("__bkt"))
        .distinct()
        .withColumn("__side", F.lit(0))
        .withColumn("__s", F.lit(None).cast(summaries.schema["__s"].dataType))
    )
    # order (bkt, side): a left marker (side 0) sees summaries (side 1)
    # of strictly earlier buckets only
    w = (
        Window.partitionBy(by)
        .orderBy("__bkt", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = (
        summaries.select(by, "__bkt", "__side", "__s")
        .unionByName(left_buckets.select(by, "__bkt", "__side", "__s"))
        .withColumn("__c", F.last("__s", ignorenulls=True).over(w))
        .filter((F.col("__side") == 0) & F.col("__c").isNotNull())
        .select(by, "__bkt", "__c", F.lit(True).alias("__pref"))
    )

    # Candidate union: real same-bucket right rows + one prefix pseudo-row
    # per (by, left-bucket). Bucket-order preservation makes prefix rows
    # valid unconditionally (their __on is strictly earlier than any
    # same-bucket left timestamp), so the union covers every possible
    # best match exactly once.
    cands = (
        r.select(
            F.col(f"r.{by}").alias(by),
            F.col("r.__bkt").alias("__bkt"),
            _right_struct(on, value_cols, "r.").alias("__c"),
            F.lit(False).alias("__pref"),
        )
        .unionByName(prefix)
        .alias("c")
    )

    # ONE equi-join on (by, bucket) — fan-out bounded by per-bucket right
    # rows + 1 — then ONE groupBy keyed by __rid (duplicate left rows
    # preserved; all left columns ride along in the grouping keys).
    best = (
        l.join(
            cands,
            (F.col(f"l.{by}") == F.col(f"c.{by}"))
            & (F.col("l.__bkt") == F.col("c.__bkt"))
            & (F.col("c.__pref") | (F.col("c.__c.__on") <= F.col(f"l.{on}"))),
            "left",
        )
        .groupBy(F.col("l.__rid"), *[F.col(f"l.{c}") for c in lc])
        .agg(F.max(F.col("c.__c")).alias("__best"))
    )
    return _expand_best(best, lc, on, value_cols, suffix)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Same semantics via per-key ``pd.merge_asof`` (applyInPandas).
    The right side is sorted by (on, *value_cols), so backward-merge
    picks the greatest value tuple among timestamp ties — matching the
    struct-max tie-break of the DataFrame variants."""
    lc = list(left.columns)
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"`{on}{suffix}` {dict(right.dtypes)[on]}"]
        + [f"`{c}{suffix}` {dict(right.dtypes)[c]}" for c in value_cols]
    )
    l_tagged = left.withColumn("__side", F.lit("L"))
    r_tagged = right.select(by, on, *value_cols).withColumn("__side", F.lit("R"))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["__side"] == "L"][lc].sort_values(on)
        rpdf = (
            pdf[pdf["__side"] == "R"][[by, on, *value_cols]]
            .dropna(subset=[on])
            .sort_values([on] + value_cols)
        )
        if lpdf.empty:
            return pd.DataFrame(
                columns=lc + [f"{on}{suffix}"] + [f"{c}{suffix}" for c in value_cols]
            )
        merged = pd.merge_asof(
            lpdf,
            rpdf.drop(columns=[by]).rename(
                columns={on: f"{on}{suffix}", **{c: f"{c}{suffix}" for c in value_cols}}
            ),
            left_on=on,
            right_on=f"{on}{suffix}",
            direction="backward",
        )
        return merged

    return unioned.groupBy(by).applyInPandas(per_key, out_schema)
