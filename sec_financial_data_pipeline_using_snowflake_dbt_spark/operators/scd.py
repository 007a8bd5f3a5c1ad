"""Slowly-changing-dimension Type-2 snapshots (dbt `snapshot` semantics).

The reference scaffolds dbt snapshot directories in both projects
(`/root/reference/Airflow/masterfindata/snapshots/.gitkeep`,
`/root/reference/Airflow/json_transform/snapshots/.gitkeep`) but ships no
snapshot models; this module supplies the engine-side operator the scaffold
implies, with dbt's documented semantics:

- **check strategy**: a row is a "new version" of its unique key whenever any
  tracked column differs from the key's previous observed state;
- the history table carries ``valid_from`` / ``valid_to`` (NULL = current) and
  a deterministic ``scd_id`` (dbt's ``dbt_scd_id`` is md5 of key||updated_at;
  ours is the F5 ``surrogate_key`` over key fields + valid_from — the same
  construction and the same dbt_utils null sentinel).

Two entry points:

- :func:`scd2_from_changelog` — replay a full changelog (many observations per
  key, totally ordered within the key) into the SCD2 history in one batch.
  This is the backfill / initial-build path.
- :func:`scd2_merge` — dbt's incremental run: fold ONE new observation batch
  (at most one state per key) into an existing history. Close changed current
  rows, append new versions, pass unchanged rows through untouched.

Scale: both paths shuffle once on the snapshot key and use only key-local
windows (lag/lead within a key's own observations — skew-bounded by the
per-key version count, never by corpus size). No global sort, no driver
state, no Python UDFs. ``scd2_merge`` touches history rows only via a
key-equi join against the (small) batch — at 100 TB the history side stays
partitioned on disk and only matching keys rewrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import surrogate_key


def _state_differs(left_prefix: str, cols: Sequence[str]) -> Column:
    """True when any tracked column differs null-safely from its
    ``left_prefix``-ed twin (dbt check-strategy change test)."""
    cond = F.lit(False)
    for c in cols:
        cond = cond | ~F.col(c).eqNullSafe(F.col(f"{left_prefix}{c}"))
    return cond


def _scd_id(key_cols: Sequence[str], valid_from: Column) -> Column:
    """Deterministic version id: the F5 dbt_utils surrogate key over the
    key fields + the version start (dbt_scd_id's construction)."""
    return surrogate_key(*[F.col(c) for c in key_cols], valid_from)


def scd2_from_changelog(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    state_cols: Sequence[str],
    strategy: str = "check",
) -> DataFrame:
    """Collapse a changelog into SCD Type-2 history.

    ``strategy`` mirrors dbt's two snapshot strategies: ``"check"`` (default)
    starts a new version on any null-safe change in ``state_cols``;
    ``"timestamp"`` starts one whenever ``order_cols[0]`` advanced past the
    previous observation's value (dbt trusts the source's updated_at and
    re-versions even if no tracked column moved — observations sharing the
    same updated_at collapse).

    ``changelog`` holds one row per OBSERVATION of a key's state;
    ``order_cols`` must totally order observations within a key (ties would
    make "previous state" ambiguous — the caller supplies a tiebreaker
    column, exactly as dbt requires a reliable ``updated_at``). Consecutive
    observations with identical ``state_cols`` collapse into one version row.

    Returns key_cols + state_cols +
    (valid_from, valid_to, is_current, n_observations, scd_id), where
    valid_from/valid_to are the FIRST ``order_cols[0]`` value of this
    version / of the next version (NULL while current) — dbt's half-open
    [valid_from, valid_to) convention.

    Plan shape: ONE Exchange on ``key_cols`` serves the whole build — every
    window below partitions by the key (the change-flag lag, the per-key
    position/row-count, and the post-filter lead all reuse the same
    partitioning, so Catalyst plans one shuffle + one sort). Version rows
    are the FILTERED change rows (valid_from is the change row's own order
    value — no groupBy materializes the islands), and observation counts
    come from row-position differences. Per-key windows only — a
    million-version key is one fat partition, never a global sort.
    """
    if not key_cols or not order_cols or not state_cols:
        raise ValueError("key_cols, order_cols and state_cols must be non-empty")
    overlap = set(state_cols) & set(key_cols)
    if overlap:
        raise ValueError(f"state_cols overlap key_cols: {sorted(overlap)}")
    if strategy not in ("check", "timestamp"):
        raise ValueError(f"strategy must be 'check' or 'timestamp', got {strategy!r}")

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    wk = Window.partitionBy(*key_cols)
    lagged = changelog.select(*key_cols, *order_cols, *state_cols).select(
        "*",
        *[F.lag(c).over(w).alias(f"__prev_{c}") for c in state_cols],
        F.lag(order_cols[0]).over(w).alias("__prev_ord"),
        F.row_number().over(w).alias("__pos"),
        F.count(F.lit(1)).over(wk).alias("__key_n"),
    )
    # Version starts: the first observation (prev order NULL) or any
    # null-safe state change. Each start row IS its version — its own
    # order value is valid_from and its state is the version state — so
    # the non-start rows simply drop (no island groupBy).
    if strategy == "timestamp":
        is_start = F.col("__prev_ord").isNull() | (
            F.col(order_cols[0]) != F.col("__prev_ord")
        )
    else:
        is_start = F.col("__prev_ord").isNull() | _state_differs(
            "__prev_", state_cols
        )
    starts = lagged.filter(is_start)
    # Order the version window by __pos — the row_number assigned in the
    # SAME Window node as the change-flag lags — never by order_cols:
    # fully-duplicate rows tie on order_cols, and a later sort that
    # re-permutes a tie block relative to where the lags were computed
    # would glue a changed state onto the previous version (two starts
    # can't tie on order_cols here, but __pos makes the order total by
    # construction instead of by argument; the oracle threads the same
    # rn for the same reason).
    wv = Window.partitionBy(*key_cols).orderBy("__pos")
    next_pos = F.lead("__pos").over(wv)
    out = starts.select(
        *key_cols,
        *state_cols,
        F.col(order_cols[0]).alias("valid_from"),
        F.lead(order_cols[0]).over(wv).alias("valid_to"),
        F.lead("__pos").over(wv).isNull().alias("is_current"),
        (F.coalesce(next_pos, F.col("__key_n") + 1) - F.col("__pos"))
        .cast("long")
        .alias("n_observations"),
    ).withColumn("scd_id", _scd_id(key_cols, F.col("valid_from")))
    return out.select(
        *key_cols,
        *state_cols,
        "valid_from",
        "valid_to",
        "is_current",
        "n_observations",
        "scd_id",
    )


def scd2_merge(
    history: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    state_cols: Sequence[str],
    observed_at_col: str,
    strategy: str = "check",
) -> DataFrame:
    """One dbt snapshot run: fold a new observation batch into ``history``.

    ``history`` has :func:`scd2_from_changelog`'s schema (``n_observations``
    optional — preserved if present, else synthesized as NULL); ``batch``
    carries key_cols + state_cols + ``observed_at_col`` with AT MOST one row
    per key (dbt's snapshot query contract — dbt itself errors on duplicate
    keys; here duplicates would fan out the join, so callers with untrusted
    batches should dedupe first or replay via :func:`scd2_from_changelog`).

    Semantics per key in the batch:
    - key unseen            → insert a new current row (valid_from = observed_at)
    - state unchanged       → history untouched (dbt does not bump timestamps)
    - state changed         → close the current row (valid_to = observed_at)
                              and insert the new current version
    Keys absent from the batch pass through untouched (a vanished source row
    is NOT a delete in dbt's default snapshot). Batch rows with a NULL
    ``observed_at`` are invalid observations and are IGNORED — existing keys
    pass through, new keys do not insert (dbt itself errors on a NULL
    updated_at; NULL-presence probing here rides the same column, so a null
    observation is indistinguishable from absence by design).

    ``strategy="timestamp"`` swaps the change test for dbt's timestamp
    strategy: the current row re-versions whenever the batch's observed_at
    is NEWER than the current version's valid_from, regardless of whether
    any tracked column moved (and never re-versions at the same instant).

    Scale: the closed/current split is a filter; only CURRENT rows join the
    batch (key-equi, batch side broadcastable when small — the nightly-run
    shape); closed history is untouched and unioned back by name. One
    shuffle (or zero with a broadcast batch) regardless of history size.
    """
    if strategy not in ("check", "timestamp"):
        raise ValueError(f"strategy must be 'check' or 'timestamp', got {strategy!r}")
    hist_cols = history.columns
    if "n_observations" not in hist_cols:
        history = history.withColumn(
            "n_observations", F.lit(None).cast("long")
        )
        hist_cols = history.columns

    closed = history.filter(~F.col("is_current"))
    current = history.filter(F.col("is_current"))

    b = batch.select(
        *[F.col(c).alias(f"__b_{c}") for c in key_cols],
        *[F.col(c).alias(f"__b_{c}") for c in state_cols],
        F.col(observed_at_col).alias("__b_observed_at"),
    )
    joined = current.join(
        b,
        on=[F.col(k).eqNullSafe(F.col(f"__b_{k}")) for k in key_cols],
        how="full_outer",
    )

    if strategy == "timestamp":
        changed = F.col("__b_observed_at") > F.col("valid_from")
    else:
        changed = _state_differs("__b_", state_cols)
    # eqNullSafe join keys mean a NULL key matches a NULL key, so the
    # "present on which side" test uses state-independent probe columns:
    has_hist = F.col("scd_id").isNotNull()
    has_batch = F.col("__b_observed_at").isNotNull()

    survivors = joined.filter(has_hist).select(
        *key_cols,
        *state_cols,
        "valid_from",
        F.when(has_batch & changed, F.col("__b_observed_at"))
        .otherwise(F.col("valid_to"))
        .alias("valid_to"),
        (~(has_batch & changed) & F.col("is_current")).alias("is_current"),
        "n_observations",
        "scd_id",
    )
    inserts = joined.filter(
        has_batch & (~has_hist | changed)
    ).select(
        *[F.col(f"__b_{k}").alias(k) for k in key_cols],
        *[F.col(f"__b_{c}").alias(c) for c in state_cols],
        F.col("__b_observed_at").alias("valid_from"),
        F.lit(None).cast(history.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.lit(1).cast("long").alias("n_observations"),
        _scd_id(
            [f"__b_{k}" for k in key_cols], F.col("__b_observed_at")
        ).alias("scd_id"),
    )
    return (
        closed.select(*hist_cols)
        .unionByName(survivors.select(*hist_cols))
        .unionByName(inserts.select(*hist_cols))
    )
