"""Local replica of the driver's DuckDB-oracle comparison: row count +
column names + order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from sec_financial_data_pipeline_using_snowflake_dbt_spark.workload.common import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # DuckDB's default memory_limit is 80% of RAM — but its buffer
    # blocks are ~256 KB and glibc mmaps every allocation that size, so
    # a grown buffer pool means HUNDREDS OF THOUSANDS of memory
    # mappings. The process then hits vm.max_map_count (65530 here)
    # long before physical memory runs out, and the heavy unrolled-CTE
    # oracles (q_ann_ivfpq) die with a spurious 16 KB "Out of Memory"
    # bad_alloc while 120 GB sits free. Cap the pool so the worst-case
    # map count stays far under the kernel limit; every oracle in the
    # registry runs comfortably inside 8 GB (verified incl. ivfpq).
    con.execute("SET memory_limit = '8GB'")
    # Per-process spill directory: an in-memory DuckDB defaults its
    # temp_directory to CWD-relative `.tmp` with NON-UNIQUE file names
    # (duckdb_temp_storage-0.tmp), so two concurrent harness processes
    # in the same repo corrupt each other's spills — one cleaning up on
    # close aborts the other mid-query (rc=-6 IOException, seen in the
    # r9 sf10 sweep when a sf0.01 verify run overlapped it).
    import os

    # DuckDB's spill-dir creation is NOT recursive: if `.tmp` itself is
    # missing the first spilling query dies with "Failed to create
    # directory" (r12 sf10 sweep) — pre-create the full path.
    os.makedirs(f".tmp/duck_{os.getpid()}", exist_ok=True)
    con.execute(f"SET temp_directory = '.tmp/duck_{os.getpid()}'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return repr(v)
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


#: Canonical null marker shared by both engines' row-string builders.
_AGG_NULL = "∅"

#: Spark dtypes the agg-compare path knows how to canonicalize. Anything
#: else (decimal, timestamp, arrays) must fail LOUD rather than hash two
#: engine-specific string renderings that merely happen to differ.
_AGG_SIMPLE = {"tinyint", "smallint", "int", "bigint", "string", "boolean", "date"}


def compare_agg(spark_df, duck_con, oracle_sql: str, name: str) -> list[str]:
    """Engine-side aggregate compare for whale outputs that cannot be
    materialized (r10: the full q_dedup_embedding arm at the largest
    test scale emits ~9e8 rows; ``compare()`` collecting 2×20+ GiB of
    pairs to one pandas process is what killed the 88-minute JVM, not
    the join). Both engines reduce their OWN result to
    ``(COUNT(*), SUM(first-15-hex-digits-of-md5(canonical row)))`` —
    Spark distributed, DuckDB native — and only two scalars cross the
    gateway.

    The checksum is order-independent (sum) and value-checking
    (collision-resistant per row); doubles are quantized at 1e-6 on BOTH
    sides (identical quantization ⇒ engines agree iff values agree to
    quantization — exact for the registry's ROUND(x, 3) outputs, whose
    doubles are the same nearest-representable on both engines). A
    weaker signal than the full sorted-value compare (no per-row diff
    sample on mismatch), recorded as ``mode: agg`` in sweep artifacts so
    the ledger stays honest about which check ran.
    """
    import pyspark.sql.functions as F

    dcols = {
        r[0]: str(r[1])
        for r in duck_con.execute(f"DESCRIBE SELECT * FROM ({oracle_sql}) oq").fetchall()
    }
    scols = dict(spark_df.dtypes)
    if sorted(scols) != sorted(dcols):
        return [
            f"{name}: column mismatch spark={sorted(scols)} oracle={sorted(dcols)}"
        ]
    cols = sorted(scols)

    def spark_canon(c: str):
        t = scols[c]
        if t in ("double", "float"):
            s = F.round(F.col(c).cast("double") * 1e6).cast("long").cast("string")
        elif t in _AGG_SIMPLE:
            s = F.col(c).cast("string")
        else:
            raise RuntimeError(f"{name}: agg-compare unsupported spark dtype {c}:{t}")
        return F.coalesce(s, F.lit(_AGG_NULL))

    def duck_canon(c: str) -> str:
        t = dcols[c].upper()
        if t in ("DOUBLE", "FLOAT", "REAL"):
            s = f'CAST(CAST(ROUND(CAST("{c}" AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)'
        elif t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "VARCHAR", "BOOLEAN", "DATE"):
            s = f'CAST("{c}" AS VARCHAR)'
        else:
            raise RuntimeError(f"{name}: agg-compare unsupported duckdb type {c}:{t}")
        return f"COALESCE({s}, '{_AGG_NULL}')"

    # every cell is COALESCE'd, so Spark concat_ws's skip-null and
    # DuckDB ||'s null-propagation never see a NULL — both emit the
    # identical '|'-joined canonical row string
    row_str = F.concat_ws("|", *[spark_canon(c) for c in cols])
    h = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("decimal(38,0)")
    srow = (
        spark_df.select(h.alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("h").alias("hsum"))
        .collect()[0]
    )
    dexpr = " || '|' || ".join(duck_canon(c) for c in cols)
    drow = duck_con.execute(
        f"SELECT COUNT(*) AS n, "
        f"SUM(CAST(CAST('0x' || SUBSTR(MD5({dexpr}), 1, 15) AS UBIGINT) AS HUGEINT)) AS hsum "
        f"FROM ({oracle_sql}) oq"
    ).fetchone()
    problems: list[str] = []
    sn, dn = int(srow["n"]), int(drow[0])
    sh, dh = int(srow["hsum"] or 0), int(drow[1] or 0)
    if sn != dn:
        problems.append(f"{name}: rowcount spark={sn} oracle={dn} (agg mode)")
    if sh != dh:
        problems.append(
            f"{name}: row-checksum mismatch spark={sh} oracle={dh} (agg mode)"
        )
    return problems


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Return list of problems (empty = match)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"{name}: rowcount spark={len(sp)} oracle={len(oracle_df)}")
    a, b = normalize(sp), normalize(oracle_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        only_a = [r for r in a if r not in set(b)][:3]
        only_b = [r for r in b if r not in set(a)][:3]
        problems.append(
            f"{name}: value mismatch ({len(diffs)} differing rows of {len(a)})\n"
            f"  spark-only sample: {only_a}\n  oracle-only sample: {only_b}"
        )
    return problems
