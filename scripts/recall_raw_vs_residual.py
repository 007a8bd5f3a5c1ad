#!/usr/bin/env python
"""NOTES_r7: recall@k of IVF+PQ raw-vector vs residual encoding against
exact brute-force ground truth — the measurement the q_ann_recall
harness enables (VERDICT r6 #5). Same IVF quantizer and probe set in
both arms, so any recall difference isolates the ENCODING."""
from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from sec_financial_data_pipeline_using_snowflake_dbt_spark.session import get_spark
from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators import similarity as SIM

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
K = 5


def recall(exact, approx) -> float:
    hits = exact.join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).count()
    return hits / exact.count()


def main() -> None:
    spark = get_spark("recall-raw-vs-residual")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    # exact squared-L2 ground truth (ADC approximates L2, so the truth
    # metric must be L2 too — brute_force_topk is cosine; use a local
    # exact L2 ranking instead)
    corpus = emb
    from pyspark.sql import Window
    qv = qs.select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("qv"))
    pairs = corpus.alias("c").crossJoin(F.broadcast(qv)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    d2 = F.aggregate(
        F.zip_with("embedding", "qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), "neighbor_id")
    exact = (
        pairs.select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
        .select("query_id", "neighbor_id")
        .persist()
    )
    exact.count()

    common = dict(dim=64, k=K, n_centroids=8, n_probe=3, m=4, k_sub=4,
                  n_train=64, pq_iters=2, round_means=6)
    raw = SIM.ivfpq_topk(qs, corpus, **common)
    res = SIM.ivfpq_topk(qs, corpus, residual=True, **common)
    # oracle-free upper bound: IVF full-vector scoring on same probes
    r_raw, r_res = recall(exact, raw), recall(exact, res)
    print(f"sf_dir={SF_DIR} n_queries={N_QUERIES} k={K}")
    print(f"recall@{K} raw-PQ      : {r_raw:.4f}")
    print(f"recall@{K} residual-PQ : {r_res:.4f}")


if __name__ == "__main__":
    main()
