"""Document-level text analysis: quality scoring, language-ID, token
counting, fingerprinting. DataFrame→DataFrame wrappers over the Column
helpers in functions/text.py — everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def text_quality(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality features: char/token counts, avg token length,
    punctuation ratio, and a composite keep/drop signal ("gopher-lite")."""
    n_chars = F.length(F.col(text_col)).cast("long")
    n_tokens = TX.token_count(text_col)
    avg_tok = F.round(n_chars.cast("double") / n_tokens.cast("double"), 4)
    punct_ratio = F.round(
        TX.punct_count(text_col).cast("double") / n_chars.cast("double"), 6
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_tok.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        TX.char_token_estimate(n_chars).alias("est_bpe_tokens"),
        (
            (n_tokens >= 5)
            & (avg_tok >= 2.0)
            & (avg_tok <= 12.0)
        )
        .cast("int")
        .alias("quality_keep"),
    )


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Marker-word language scores + argmax prediction.

    Emits one score column per language in ``TX.LANG_MARKERS`` and
    ``pred_lang`` = language with the highest hit count (alphabetical
    tie-break). Deterministic; heuristic by design.
    """
    out = docs.select(F.col(id_col), F.col(text_col))
    langs = sorted(TX.LANG_MARKERS)
    for lang in langs:
        out = out.withColumn(
            f"score_{lang}", TX.marker_hits(text_col, TX.LANG_MARKERS[lang])
        )
    # argmax with alphabetical tie-break: greatest(structs) trick avoided —
    # fold with explicit comparisons for portability
    pred = F.lit(langs[0])
    best = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        s = F.col(f"score_{lang}")
        pred = F.when(s > best, F.lit(lang)).otherwise(pred)
        best = F.when(s > best, s).otherwise(best)
    return out.select(
        id_col, *[f"score_{lang}" for lang in langs], pred.alias("pred_lang")
    )


def fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Normalized-text md5 fingerprint per document."""
    return docs.select(
        F.col(id_col),
        TX.fingerprint(text_col).alias("fingerprint"),
    )


def assign_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train: int = 90,
    val: int = 5,
    buckets: int = 100,
) -> DataFrame:
    """Deterministic train/val/test assignment for corpus building.

    Bucket = first 4 hex digits of md5(id) mod ``buckets`` — a pure
    function of the row id: stable across runs, engines, partitionings,
    and cluster sizes (unlike ``rand()`` or Spark's ``hash()``), so a
    document never migrates between splits as the corpus grows.
    """
    h = F.md5(F.col(id_col).cast("string"))
    bucket = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % buckets).alias(
        "bucket"
    )
    split = (
        F.when(F.col("bucket") < train, "train")
        .when(F.col("bucket") < train + val, "val")
        .otherwise("test")
    )
    return docs.select(F.col(id_col), bucket).select(
        id_col, F.col("bucket").cast("int").alias("bucket"), split.alias("split")
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling (e.g. language rebalancing for a training
    mix): ``sampleBy`` with a fixed seed. Deterministic for a fixed
    partitioning, but NOT across engines/layouts — downsampling is a
    statistical op, so correctness checks assert rates, not rows."""
    return docs.sampleBy(strata_col, fractions, seed)
