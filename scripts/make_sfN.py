#!/usr/bin/env python
"""Scale the driver's sf0.1 testdata by an integer factor for LOCAL
scaling experiments (VERDICT r5 #1: back the 100 TB plan-shape claims
with observed scaling exponents). Writes to /root/repo/.localdata/sfN
(gitignored) — /root/testdata is read-only and is never touched.

Replication is NOT naive row copying: the goal is that each derived
table models how the REAL workload grows, so observed sfN/sf0.1 timing
ratios are attributable to the engine, not to an artificial data shape.

- documents: replica k > 0 suffixes every token with "k" — within-replica
  duplicate/near-dup structure is preserved verbatim, but cross-replica
  texts share no shingles, so near-dup PAIR counts grow ~linearly with
  the factor (naive copies would square each dup group: 10 copies of a
  5-dup cluster is a 50-doc cluster = 100x the pairs, faking a
  superlinear engine cost).
- embeddings: vec_id offset + a tiny deterministic per-replica vector
  nudge (cross-replica vectors are near but not identical — ANN
  candidate sets stay realistic, no mass cos=1.0 ties).
- events: user_id offset per replica — the stream gains NEW users, so
  per-user session state stays constant (10x deeper sessions per user
  would be a different workload, not a bigger one).
- lineitem/orders/customer: key offsets per replica (orderkey, custkey);
  part/supplier dims are kept fixed so fact fan-in grows, which is how
  a star schema actually scales.
- region/nation/part/supplier: copied as-is.

Usage: python scripts/make_sfN.py [factor]   (default 10 -> sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from sec_financial_data_pipeline_using_snowflake_dbt_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def replicate(df: DataFrame, factor: int) -> DataFrame:
    """Cross join with replica ids 0..factor-1; k=0 keeps the original
    rows byte-identical so sfN is a superset of sf0.1."""
    reps = df.sparkSession.range(factor).select(F.col("id").cast("int").alias("k"))
    return df.crossJoin(F.broadcast(reps))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = f"/root/repo/.localdata/sf{factor * 0.1:g}"
    os.makedirs(out, exist_ok=True)
    spark = get_spark("make-sfN")

    def src(t: str) -> DataFrame:
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    def write(df: DataFrame, t: str) -> None:
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count(), flush=True)

    for t in ("region", "nation", "part", "supplier"):
        write(src(t), t)

    docs = src("documents")
    n_docs = docs.count()
    perturbed_text = F.when(F.col("k") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.col("k").cast("string")),
            ),
            " ",
        )
    )
    write(
        replicate(docs, factor).select(
            (F.col("doc_id") + F.col("k").cast("long") * F.lit(n_docs)).alias(
                "doc_id"
            ),
            perturbed_text.alias("text"),
            "lang",
            "source",
            F.length(perturbed_text).alias("n_chars"),
        ),
        "documents",
    )

    emb = src("embeddings")
    n_vecs = emb.count()
    nudged = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x + F.col("k").cast("float") * F.lit(0.001) * ((i % 7) - 3).cast("float")
        ).cast("float"),
    )
    write(
        replicate(emb, factor).select(
            (F.col("vec_id") + F.col("k").cast("long") * F.lit(n_vecs)).alias(
                "vec_id"
            ),
            nudged.alias("embedding"),
            "label",
        ),
        "embeddings",
    )

    ev = src("events")
    n_events = ev.count()
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    write(
        replicate(ev, factor).select(
            (F.col("event_id") + F.col("k").cast("long") * F.lit(n_events)).alias(
                "event_id"
            ),
            "ts",
            (F.col("user_id") + F.col("k").cast("long") * F.lit(n_users)).alias(
                "user_id"
            ),
            "event_type",
            "value",
            "props",
        ),
        "events",
    )

    cust = src("customer")
    n_cust = cust.agg(F.max("c_custkey")).first()[0] + 1
    key_cols = {c for c in cust.columns}
    write(
        replicate(cust, factor).select(
            *[
                (
                    (F.col("c_custkey") + F.col("k").cast("long") * F.lit(n_cust)).alias(
                        "c_custkey"
                    )
                    if c == "c_custkey"
                    else F.col(c)
                )
                for c in key_cols
            ]
        ),
        "customer",
    )

    orders = src("orders")
    n_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1
    write(
        replicate(orders, factor).select(
            (F.col("o_orderkey") + F.col("k").cast("long") * F.lit(n_ord)).alias(
                "o_orderkey"
            ),
            (F.col("o_custkey") + F.col("k").cast("long") * F.lit(n_cust)).alias(
                "o_custkey"
            ),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ),
        "orders",
    )

    li = src("lineitem")
    write(
        replicate(li, factor).select(
            (F.col("l_orderkey") + F.col("k").cast("long") * F.lit(n_ord)).alias(
                "l_orderkey"
            ),
            *[c for c in li.columns if c != "l_orderkey"],
        ),
        "lineitem",
    )
    spark.stop()
    print("DONE", out)


if __name__ == "__main__":
    main()
