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
