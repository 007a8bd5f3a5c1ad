"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementations live in the package; this module is a thin
adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sec_financial_data_pipeline_using_snowflake_dbt_spark.workload import (
    ORACLES,
    QUERIES,
)
from sec_financial_data_pipeline_using_snowflake_dbt_spark.workload.relational import (
    q_broadcast_star,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the broadcast star join —
    revenue by region/nation over lineitem ⋈ supplier ⋈ nation ⋈ region."""
    return q_broadcast_star(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data extension operators)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (absent ⇒ rows-only check)."""
    return dict(ORACLES)
