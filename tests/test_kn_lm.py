"""Kneser-Ney bigram scorer (operators/textops.py kneser_ney_logprob):
agreement with a sequential Python reference, distribution sanity, and
argument validation."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest

from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators.textops import (
    kneser_ney_logprob,
)


def _reference(docs, discount):
    """Sequential interpolated-KN bigram scorer over (id, text) pairs."""
    tok = {i: t.lower().split() for i, t in docs}
    bigrams = Counter()
    for ts in tok.values():
        bigrams.update(zip(ts, ts[1:]))
    cc = defaultdict(int)
    n1f = defaultdict(int)
    n1b = defaultdict(int)
    for (w1, w2), c in bigrams.items():
        cc[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    types = float(len(bigrams))

    out = {}
    for i, ts in tok.items():
        lps = []
        for w1, w2 in zip(ts, ts[1:]):
            p = (bigrams[(w1, w2)] - discount) / cc[w1] + discount * n1f[
                w1
            ] / cc[w1] * (n1b[w2] / types)
            lps.append(math.log(p))
        if lps:
            out[i] = (len(lps), round(sum(lps) / len(lps), 6))
    return out


def _spark_result(spark, docs, discount):
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    rows = kneser_ney_logprob(df, discount=discount).collect()
    return {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"]) for r in rows}


def test_agrees_with_sequential_reference(spark):
    rng = random.Random(84)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
        for i in range(60)
    ]
    for d in (0.25, 0.75):
        got = _spark_result(spark, docs, d)
        want = _reference(docs, d)
        assert set(got) == set(want)
        for i in got:
            assert got[i][0] == want[i][0]
            assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)


def test_continuation_probability_drives_ranking(spark):
    """The KN signature: a word frequent in ONE context only ('francisco'
    after 'san') gets a LOWER continuation weight than a word that
    follows many contexts, even at equal unigram frequency."""
    docs = [
        (1, "san francisco san francisco san francisco san francisco"),
        (2, "a the b the c the d the"),
        # scored pair: novel context for 'francisco' vs for 'the'
        (3, "x francisco"),
        (4, "x the"),
    ]
    got = _spark_result(spark, docs, 0.75)
    want = _reference(docs, 0.75)
    assert got == want
    # 'the' follows 4 distinct contexts + 'x'; 'francisco' follows 2
    assert got[4][1] > got[3][1]


def test_short_docs_drop_and_bad_discount_raises(spark):
    docs = [(1, "solo"), (2, ""), (3, "two tokens")]
    got = _spark_result(spark, docs, 0.75)
    assert set(got) == {3}
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    for bad in (0.0, 1.0, -0.5):
        with pytest.raises(ValueError):
            kneser_ney_logprob(df, discount=bad)
