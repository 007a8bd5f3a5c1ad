"""Shared helpers for workload queries.

Oracle-parity conventions used by every query:

- Money math in DECIMAL: doubles are cast to DECIMAL(18,2) *before*
  multiplication/summation, so the aggregate is exact in both engines;
  the final value is cast back to double. Floating-point sums are only
  taken over integral-valued columns (exact at any accumulation order).
- Derived averages: exact decimal sum -> double -> one IEEE division ->
  round — bitwise identical on both engines.
- Timestamps/dates leave the query as formatted strings (engines differ
  in timestamp physical types but not in strftime output).
- Integer outputs are cast to long/BIGINT on both sides (Spark count vs
  DuckDB HUGEINT sums would otherwise mismatch schemas).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # deterministic semantics regardless of the host session: UTC for
    # timestamp rendering (the DuckDB oracle is tz-naive) and ANSI off
    # for Snowflake-style null-on-error casts (Spark 4 defaults ANSI on)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    rejects; read nanos as long and convert to a µs timestamp (values are
    µs-aligned, so the conversion is lossless). Defensive conf.set: the
    config is runtime-settable and the driver's session may not have it."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for SQL-API queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.DecimalType(precision, scale))


def as_dbl(c: Column) -> Column:
    return c.cast("double")


def money_sum(col: str | Column) -> Column:
    """Exact decimal sum of a 2-dp money column, emitted as double."""
    return as_dbl(F.sum(dec(col)))


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


def charge_expr() -> Column:
    """revenue * (1 + l_tax), exact decimal (scale bounded to stay exact
    on both engines)."""
    return revenue_expr().cast(T.DecimalType(18, 4)) * (F.lit(1) + dec("l_tax"))


# SQL-side equivalents (DuckDB dialect)
SQL_REVENUE = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
SQL_CHARGE = (
    f"CAST({SQL_REVENUE} AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2)))"
)
