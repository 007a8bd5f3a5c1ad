"""As-of join — an operator Spark lacks natively (SURVEY §2.3 notes the
reference has no theta/as-of joins either; this is engine completeness
for time-series workloads).

Two implementations with identical semantics (latest right-side row at
or before each left-side timestamp, per key):

- ``asof_join``        — pure DataFrame composition: range join + groupBy
                         max + self-join back. Catalyst-visible, no
                         Python; the default. At scale, the range join is
                         the cost center — bucketize the time axis first
                         (``time_bucket``) to turn it into an equi-join.
- ``asof_join_pandas`` — ``applyInPandas`` per key group using
                         ``pd.merge_asof`` (sorted-merge, O(n+m) per
                         group). Wins when per-key data is large and the
                         range join would fan out.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the right row with the greatest ``on`` ≤ the
    left's ``on``, matching ``by``. Left rows with no match keep NULLs."""
    l = left.alias("l")
    r = right.alias("r")
    cond = (F.col(f"l.{by}") == F.col(f"r.{by}")) & (
        F.col(f"r.{on}") <= F.col(f"l.{on}")
    )
    # step 1: per left row, the max right timestamp at-or-before
    lkey = [F.col(f"l.{c}") for c in left.columns]
    best = (
        l.join(r, cond, "left")
        .groupBy(*lkey)
        .agg(F.max(F.col(f"r.{on}")).alias(f"{on}{suffix}"))
    )
    # step 2: join the right values back on (by, exact matched timestamp)
    b = best.alias("b")
    r2 = right.alias("r2")
    back = (F.col(f"b.{by}") == F.col(f"r2.{by}")) & (
        F.col(f"b.{on}{suffix}") == F.col(f"r2.{on}")
    )
    out_cols = [F.col(f"b.{c}") for c in left.columns] + [
        F.col(f"b.{on}{suffix}")
    ] + [F.col(f"r2.{c}").alias(f"{c}{suffix}") for c in value_cols]
    # dropDuplicates: several right rows can share the max timestamp;
    # keep one deterministically via the max of the value columns
    joined = b.join(r2, back, "left").select(*out_cols)
    agg = [F.max(f"{c}{suffix}").alias(f"{c}{suffix}") for c in value_cols]
    return joined.groupBy(*[c for c in left.columns], f"{on}{suffix}").agg(*agg)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Same semantics via per-key ``pd.merge_asof`` (applyInPandas)."""
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
