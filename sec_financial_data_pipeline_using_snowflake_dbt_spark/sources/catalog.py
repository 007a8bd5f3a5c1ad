"""Materialization sinks + catalog helpers (SURVEY §2.1 S10/S11).

Maps the reference's dbt materialization/`cluster_by` configs
(reference: Airflow/masterfindata/dbt_project.yml:28-45,
models/Staging/stg_num.sql:2-6, models/Facts/fct_balanceSheet.sql:1-6)
onto Spark's storage primitives:

- ``view``                → temp view (lazy lineage)
- ``table``               → Parquet write; ``cluster_by`` becomes
                            repartition+sortWithinPartitions (co-located,
                            sorted runs inside each file — the micro-
                            partition-clustering analogue)
- ``table`` + ``bucket_by`` → ``bucketBy(n, keys).sortBy(keys)
                            .saveAsTable`` — the strongest form: joins
                            and aggregations on the bucket keys skip the
                            shuffle entirely (verified in
                            tests/test_bucketing.py)

At 100 TB, bucketing the NUM table by ``adsh`` makes every
NUM⋈PRE/NUM⋈SUB join shuffle-free on the fact side — the single
biggest cost in the star build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize(
    df: DataFrame,
    name: str,
    mode: str = "view",
    warehouse_dir: str | None = None,
    cluster_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
) -> DataFrame:
    """Materialize ``df`` as ``name`` per the requested strategy and
    return a re-readable DataFrame registered as a temp view."""
    spark = df.sparkSession
    if mode == "view":
        df.createOrReplaceTempView(name)
        return df
    if mode != "table":
        raise ValueError(f"unknown materialization {mode!r}")
    if bucket_by:
        n, keys = bucket_by
        # a previous session may have left the managed location behind
        # without a catalog entry — clear both before writing
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        location = f"{warehouse_dir}/{name}" if warehouse_dir else (
            f"{spark.conf.get('spark.sql.warehouse.dir')}/{name}"
        )
        jpath = spark._jvm.org.apache.hadoop.fs.Path(location)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jpath, True)
        writer = df.write.mode("overwrite").bucketBy(n, *keys).sortBy(*keys)
        if warehouse_dir:
            writer = writer.option("path", f"{warehouse_dir}/{name}")
        writer.saveAsTable(name)
        out = spark.table(name)
    else:
        if not warehouse_dir:
            raise ValueError("table materialization needs warehouse_dir")
        out_df = df
        if cluster_by:
            out_df = df.repartition(*cluster_by).sortWithinPartitions(*cluster_by)
        out_df.write.mode("overwrite").parquet(f"{warehouse_dir}/{name}")
        out = spark.read.parquet(f"{warehouse_dir}/{name}")
        out.createOrReplaceTempView(name)
    return out


def list_tables(spark: SparkSession, db: str = "default") -> list[str]:
    return [t.name for t in spark.catalog.listTables(db)]
