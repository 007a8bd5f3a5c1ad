"""Manual skew mitigation: the salting fallback for joins whose hot
keys defeat AQE's skew splitting (SURVEY §7 phase 7 — the adsh-skew
posture at fact scale).

AQE's skew-join handling covers sort-merge joins between shuffle
stages; it cannot split a hot key when the join is the build side of a
required distribution (e.g. a bucketed table's co-located join) or when
runtime stats arrive too late. ``salted_join`` is the explicit
fallback: the skewed (fact) side spreads each key over ``buckets``
sub-keys, the small (dim) side replicates ×buckets, and the join runs
on (key, salt) — the hot key's rows land on ``buckets`` tasks instead
of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(cols: list[str | Column], buckets: int) -> Column:
    """Salt in [0, buckets) as a retry-stable function of row content
    AND the map partition id — never ``rand()``: a nondeterministic
    salt changes value when a task retries, silently dropping or
    duplicating join rows (the same class of bug as the as-of join's
    old row ids). ``spark_partition_id()`` is stable under task retry
    (the same partition re-executes with the same id) and rescues the
    fully-duplicate-row case: a hot key whose rows are IDENTICAL across
    the salt columns would otherwise hash to one bucket and defeat the
    salting entirely; mixing the partition id spreads such rows across
    at least as many buckets as the map partitions holding them (only
    identical rows within one map partition still share a bucket —
    bounded by one task's input, which is the acceptable floor)."""
    return F.pmod(
        F.xxhash64(*cols, F.spark_partition_id()), F.lit(buckets)
    ).cast("int")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on ``on``, spread over ``buckets``
    sub-partitions per key.

    ``salt_cols`` (default: every skewed-side column) feed the
    deterministic salt; the small side explodes ×buckets, so its size
    must tolerate the replication — that is the salting trade: fact
    rows never move twice, dim rows replicate ``buckets``×.

    Exact for inner and left joins (every fact row meets its key's dim
    rows exactly once, in exactly one salt bucket).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = deterministic_salt(
        [F.col(c) for c in (salt_cols or skewed.columns)], buckets
    )
    s = skewed.withColumn("__salt", salt)
    d = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return s.join(d, [on, "__salt"], how).drop("__salt")
