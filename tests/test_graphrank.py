"""Integer fixed-point PageRank (operators/graphrank.py): agreement with
a sequential integer reference, dangling-mass redistribution, structure
sanity, and validation."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators.graphrank import (
    UNIT,
    pagerank,
)


def _reference(edges, iters=5, d=85):
    """Sequential integer PageRank implementing the exact module spec."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out_deg = defaultdict(int)
    for u, _ in edges:
        out_deg[u] += 1
    base = UNIT // n
    rank = {v: base for v in nodes}
    for _ in range(iters):
        share = {u: rank[u] // out_deg[u] for u in nodes if out_deg[u] > 0}
        inflow = defaultdict(int)
        for u, v in edges:
            if u in share:
                inflow[v] += share[u]
        dang = sum(rank[u] for u in nodes if out_deg[u] == 0)
        rank = {
            v: ((100 - d) * base) // 100
            + (d * (inflow[v] + dang // n)) // 100
            for v in nodes
        }
    return rank


def _spark(spark, edges, iters=5, d=85):
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    out = pagerank(df, iters=iters, damping_pct=d).collect()
    return {r["node"]: r["rank_units"] for r in out}


def test_agrees_with_sequential_reference_random_graph(spark):
    rng = random.Random(85)
    nodes = [f"n{i}" for i in range(30)]
    edges = sorted(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(150)
        }
    )
    for iters in (1, 5):
        assert _spark(spark, edges, iters=iters) == _reference(edges, iters=iters)


def test_dangling_mass_redistributes(spark):
    # star: hub -> 3 leaves; leaves are dangling. Without redistribution
    # the leaves would drain all mass; with it, total mass stays ~UNIT.
    edges = [("hub", "a"), ("hub", "b"), ("hub", "c")]
    got = _spark(spark, edges)
    total = sum(got.values())
    # integral truncation leaks at most a few units per node per iteration
    assert abs(total - UNIT) < 5 * 4 * 100
    # leaves split the hub's mass equally and outrank the hub
    assert got["a"] == got["b"] == got["c"] > got["hub"]


def test_ring_is_uniform_and_authority_ranks_highest(spark):
    ring = [(f"r{i}", f"r{(i + 1) % 6}") for i in range(6)]
    got = _spark(spark, ring)
    assert len(set(got.values())) == 1  # symmetry -> identical ranks
    # add an authority: everyone also points at r0
    star = ring + [(f"r{i}", "r0") for i in range(1, 6)]
    got2 = _spark(spark, star)
    assert got2["r0"] == max(got2.values())
    assert got2["r0"] > got2["r1"]


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src STRING, dst STRING")
    with pytest.raises(ValueError):
        pagerank(df, iters=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=100)
