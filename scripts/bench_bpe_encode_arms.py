#!/usr/bin/env python
"""NOTES_r7 experiment: BPE encode at real merge-table sizes.

The synthetic documents table has only 31 distinct words, so a
1000-rule table can't be LEARNED from it; this bench derives a
richer-vocabulary corpus (each word salted with a per-doc-bucket hex
suffix -> ~3k distinct words) purely to exercise encode depth, trains
the merge table DRIVER-SIDE with the same sequential reference
algorithm the property tests pin bpe_train against, then times
bpe_encode_counts' two arms. The chain arm is expected to stop
planning well below 1000 merges — that is the point of the ranked arm.

Usage: python scripts/bench_bpe_encode_arms.py [n_merges] [chain|ranked|both]
"""
from __future__ import annotations

import sys
import time
from collections import Counter

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from sec_financial_data_pipeline_using_snowflake_dbt_spark.session import get_spark
from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators import textops as TO

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
ARMS = sys.argv[2] if len(sys.argv) > 2 else "both"
SF_DIR = "/root/testdata/sf0.1"


def train_reference(word_freq: Counter, n_merges: int) -> list[tuple[str, str]]:
    """Driver-side training via the engine's own ``_bpe_train_driver``
    (one implementation, not a bench-local copy that could desync)."""
    return [
        (s1, s2)
        for _step, s1, s2, _merged, _cnt in TO._bpe_train_driver(
            list(word_freq.items()), n_merges
        )
    ]


def main() -> None:
    spark = get_spark("bpe-encode-bench")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # richer vocabulary: salt every word with a 3-hex-char suffix keyed
    # on (word, doc_id % 101) -> ~31*101 distinct words of realistic len
    rich = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.transform(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != ""),
                lambda w: F.concat(
                    w, F.substring(F.md5(F.concat(w, (F.col("doc_id") % 101))), 1, 3)
                ),
            ),
        ).alias("text"),
    ).persist()
    n_docs = rich.count()

    wf_rows = (
        rich.select(F.explode(F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")).alias("w"))
        .groupBy("w").count().collect()
    )
    wf = Counter({r.w: r["count"] for r in wf_rows})
    print(f"corpus: {n_docs} docs, {len(wf)} distinct words")

    t0 = time.perf_counter()
    merges = train_reference(wf, N_MERGES)
    print(f"trained {len(merges)} merges driver-side in {time.perf_counter()-t0:.1f}s")

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    if ARMS in ("both", "ranked"):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(TO.bpe_encode_counts(rich, merges, strategy="ranked"))
            best = min(best, time.perf_counter() - t0)
        print(f"RANKED arm, {len(merges)} merges: best-of-3 {best:.2f}s")
        agg = (
            TO.bpe_encode_counts(rich, merges, strategy="ranked")
            .agg(F.sum("n_bpe_tokens"), F.sum("n_words")).collect()[0]
        )
        print(f"  total bpe tokens {agg[0]}, words {agg[1]}")

    if ARMS in ("both", "chain"):
        t0 = time.perf_counter()
        force(TO.bpe_encode_counts(rich, merges, strategy="chain"))
        print(f"CHAIN arm, {len(merges)} merges: single rep {time.perf_counter()-t0:.2f}s")

    if ARMS in ("both", "ids"):
        # the id-emitting encoder's scale arm (full per-doc sequences,
        # not just counts) — vocab derives once, then 3 timed encodes
        vocab = TO.bpe_vocab(rich, merges)
        print(f"vocab: {len(vocab)} symbols")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(TO.bpe_encode_ids(rich, merges, vocab=vocab, strategy="ranked"))
            best = min(best, time.perf_counter() - t0)
        print(f"IDS ranked arm, {len(merges)} merges: best-of-3 {best:.2f}s")
        agg = (
            TO.bpe_encode_ids(rich, merges, vocab=vocab, strategy="ranked")
            .agg(F.sum("n_tokens")).collect()[0]
        )
        print(f"  total ids emitted {agg[0]}")


if __name__ == "__main__":
    main()
