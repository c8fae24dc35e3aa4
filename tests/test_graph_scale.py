"""Scale-shape tests for functions/graph.py (round-7 VERDICT asks #2
and #4): size-gated broadcasts on the node-sized iteration tables, and
the frontier-optimized label propagation.

The broadcast gate is the 100 TB guard: a |V|-sized rank/label/distance
table cannot broadcast at a billion nodes — the hint must disappear
above the threshold while results stay bit-identical either way."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark.functions.graph import (
    PR_SCALE,
    _gate_broadcast,
    label_propagation,
    pagerank,
    sssp_bounded,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextlib.contextmanager
def _no_auto_broadcast(spark):
    """Disable Catalyst's size-based auto-broadcast so a BroadcastHashJoin
    in the plan can only come from the explicit hint under test."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


# ------------------------------------------------------------- the gate


def test_gate_broadcast_hints_only_below_threshold(spark):
    with _no_auto_broadcast(spark):
        big = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
        small = spark.range(0, 10).select(F.col("id").alias("k"))
        # below the bound: the explicit hint forces a broadcast join
        hinted = big.join(_gate_broadcast(small, 10, 100), "k")
        assert "BroadcastHashJoin" in _plan(hinted)
        # above the bound: no hint, and with auto-broadcast off the
        # planner must pick a shuffle-based join — the plan you'd run
        # when the node table is a billion rows
        gated = big.join(_gate_broadcast(small, 10, 5), "k")
        assert "BroadcastHashJoin" not in _plan(gated)


# -------------------------------------------- results identical both ways


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_identical_above_and_below_gate(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)]
    ranks_bc, it_bc = pagerank(_edges(spark, pairs), max_iters=4)
    ranks_sh, it_sh = pagerank(
        _edges(spark, pairs), max_iters=4, broadcast_max_nodes=0
    )
    assert it_bc == it_sh
    assert sorted(map(tuple, ranks_bc.collect())) == sorted(
        map(tuple, ranks_sh.collect())
    )


def test_sssp_identical_above_and_below_gate(spark):
    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (1, 3, 10), (3, 4, 2)], "src long, dst long, w long"
    )
    sources = spark.createDataFrame([(1,)], "node long")
    d_bc = sssp_bounded(edges, sources, max_hops=3)
    d_sh = sssp_bounded(edges, sources, max_hops=3, broadcast_max_nodes=0)
    assert sorted(map(tuple, d_bc.collect())) == sorted(map(tuple, d_sh.collect()))


def test_label_propagation_identical_above_and_below_gate(spark):
    pairs = [(1, 2), (2, 1), (2, 3), (3, 2), (4, 5), (5, 4), (3, 4), (4, 3)]
    l_bc = label_propagation(_edges(spark, pairs), iters=3)
    l_sh = label_propagation(_edges(spark, pairs), iters=3, broadcast_max_nodes=0)
    assert sorted(map(tuple, l_bc.collect())) == sorted(map(tuple, l_sh.collect()))


# ------------------------------------------------- frontier optimization


def _lpa_reference(pairs, n_rounds):
    """Driver-side synchronous LPA with the same determinization (most
    frequent in-neighbor label, ties to smallest) — the oracle for the
    frontier-optimized distributed form."""
    nodes = sorted({x for p in pairs for x in p})
    in_nbrs: dict[int, list[int]] = {v: [] for v in nodes}
    for s, d in pairs:
        in_nbrs[d].append(s)
    labels = {v: v for v in nodes}
    for _ in range(n_rounds):
        new = {}
        for v in nodes:
            if not in_nbrs[v]:
                new[v] = labels[v]
                continue
            freq: dict[int, int] = {}
            for u in in_nbrs[v]:
                freq[labels[u]] = freq.get(labels[u], 0) + 1
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            break
        labels = new
    return labels


@pytest.mark.parametrize("iters", [1, 2, 4])
def test_label_propagation_matches_reference(spark, iters):
    # two K3 cliques bridged by one undirected edge + a dangling spur:
    # exercises ties, convergence, and no-in-edge keep-label
    und = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    pairs = und + [(b, a) for a, b in und] + [(7, 1)]  # 7->1 only: 7 keeps label
    got = dict(
        map(tuple, label_propagation(_edges(spark, pairs), iters=iters).collect())
    )
    assert got == _lpa_reference(pairs, iters)


def test_label_propagation_frontier_shrinks_and_early_stops(spark):
    # K4 clique (both directions): round 1 changes all 4 labels,
    # round 2 changes exactly one (node 1 -> 1 settles back), round 3
    # changes none -> early stop. Frontier sizes must shrink strictly.
    und = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    sizes: list[int] = []
    labels = label_propagation(
        _edges(spark, und), iters=10, frontier_sizes=sizes
    )
    assert sizes[-1] == 0, sizes
    assert len(sizes) < 10, "fixed point must stop early"
    assert all(a > b for a, b in zip(sizes, sizes[1:])), sizes
    # and the fixed point is the reference's
    assert dict(map(tuple, labels.collect())) == _lpa_reference(und, 10)


def test_pagerank_ranks_sum_to_scale(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (4, 1)]  # 4 is source-only; 3->1 etc.
    ranks, _ = pagerank(_edges(spark, pairs), max_iters=3)
    total = ranks.agg(F.sum("r")).collect()[0][0]
    # conserved up to integer-division remainders (n_nodes per division)
    assert abs(total - PR_SCALE) < 4 * 100


# ------------------------------- catalog query routes through the gate


def test_pagerank_part_supplier_routes_through_gated_library(spark, monkeypatch):
    """Round-7 verdict #1: the catalog's pagerank_part_supplier used to
    inline its own loop with unconditional node-sized F.broadcast hints
    (a driver-OOM plan at a billion nodes).  Pin that it now calls the
    size-gated library pagerank — every node-sized broadcast decision
    must pass through _gate_broadcast with the documented threshold —
    and that forcing the gate SHUT (shuffle joins everywhere) yields
    the identical top-20."""
    from starryskyqueryengine_spark import catalog_analytics as ca
    from starryskyqueryengine_spark.functions import graph

    sf = "/root/testdata/sf0.001"
    calls: list[tuple[int, int]] = []
    real_gate = graph._gate_broadcast

    def spy(df, n_rows, max_rows):
        calls.append((n_rows, max_rows))
        return real_gate(df, n_rows, max_rows)

    monkeypatch.setattr(graph, "_gate_broadcast", spy)
    base = sorted(map(tuple, ca.pagerank_part_supplier(spark, sf).collect()))
    assert calls, "catalog query must route broadcasts through the size gate"
    assert all(mx == graph.BROADCAST_MAX_NODES for _, mx in calls)
    assert len(base) == 20

    # gate forced shut: broadcast_max_nodes=0 -> no hint anywhere; the
    # 100 TB plan (shuffle joins) must produce bit-identical ranks
    real_pr = graph.pagerank

    def no_broadcast_pr(edges, **kw):
        kw["broadcast_max_nodes"] = 0
        return real_pr(edges, **kw)

    monkeypatch.setattr(graph, "pagerank", no_broadcast_pr)
    gated = sorted(map(tuple, ca.pagerank_part_supplier(spark, sf).collect()))
    assert gated == base


def test_pagerank_lazy_path_no_per_round_materialization(spark, monkeypatch):
    """With no dangling node and no tolerance there are no per-round
    driver collects, so the rank lineage is a linear lazy chain: the
    loop must not cache (or count) per round — round-7's per-round
    cache+count was a measured 1.5x bench regression on this path.
    Setup caches exactly 4 tables (edges, deg, nodes, dangling)."""
    probe = spark.range(1)
    df_cls = type(probe)  # the concrete DataFrame class this session uses

    counts = {"cache": 0}
    real_cache = df_cls.cache

    def spy(self):
        counts["cache"] += 1
        return real_cache(self)

    monkeypatch.setattr(df_cls, "cache", spy)
    pairs = [(1, 2), (2, 3), (3, 1)]  # cycle: every node has an out-edge
    ranks, it = pagerank(_edges(spark, pairs), max_iters=6)
    assert it == 6
    assert counts["cache"] == 4, counts
    # and the lazy chain still computes the right thing
    total = ranks.agg(F.sum("r")).collect()[0][0]
    assert abs(total - PR_SCALE) < 3 * 100


def test_sssp_sources_absent_from_edges(spark):
    """Round-7 advice #3: the broadcast-gate bound must cover seed
    nodes that appear in no edge — they still carry dist 0 in every
    round's table.  Semantics: an isolated source is reported at
    distance 0; reachable nodes relax normally."""
    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1)], "src long, dst long, w long"
    )
    sources = spark.createDataFrame([(1,), (99,)], "node long")  # 99 isolated
    got = dict(map(tuple, sssp_bounded(edges, sources, max_hops=3).collect()))
    assert got == {1: 0, 99: 0, 2: 5, 3: 6}
    # gate forced shut must agree (99 counted in the bound either way)
    got_sh = dict(
        map(
            tuple,
            sssp_bounded(
                edges, sources, max_hops=3, broadcast_max_nodes=0
            ).collect(),
        )
    )
    assert got_sh == got


def test_label_prop_releases_caches_and_bounds_plan_growth(spark, monkeypatch):
    """ADVICE r8 + the bug it uncovered.  (a) Every DataFrame
    label_propagation caches must receive an unpersist before it
    returns — the iters-exhausted exit used to leak the final round's
    node-sized materialization.  (b) Per-round cache+count truncated
    EXECUTION but not the LOGICAL plan: each round referenced the prior
    round's plan ~4x, so plan trees grew 4^rounds and iters=10 OOMed
    the driver just stringifying the tree.  Per-round localCheckpoint
    severs the plan; a 10-round run on an oscillating (never-converging)
    graph must now complete and stay correct."""
    probe = spark.range(1)
    df_cls = type(probe)
    cached, released = [], []
    real_cache, real_unpersist = df_cls.cache, df_cls.unpersist

    def spy_cache(self):
        cached.append(id(self))
        return real_cache(self)

    def spy_unpersist(self, blocking=False):
        released.append(id(self))
        return real_unpersist(self, blocking)

    monkeypatch.setattr(df_cls, "cache", spy_cache)
    monkeypatch.setattr(df_cls, "unpersist", spy_unpersist)

    # iters=1 exercises the i == iters-1 fast exit (the leaky branch)
    edges = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 2)])
    one = dict(map(tuple, label_propagation(edges, iters=1).collect()))
    leaked = set(cached) - set(released)
    assert not leaked, f"{len(leaked)} cached frame(s) never unpersisted"
    # round 1: 1 adopts 2's label; 2 adopts min(1,3)=1; 3 adopts 2
    assert one == {1: 2, 2: 1, 3: 2}

    # synchronous LPA on this path graph OSCILLATES (bipartite-style),
    # so iters=10 runs all ten rounds — the plan-growth regression case
    cached.clear(), released.clear()
    ten = dict(map(tuple, label_propagation(edges, iters=10).collect()))
    leaked = set(cached) - set(released)
    assert not leaked, f"{len(leaked)} cached frame(s) never unpersisted"
    # period-2 oscillation: even rounds sit on the round-2 state
    assert ten == {1: 1, 2: 2, 3: 1}


def test_label_prop_reuses_caller_edge_cache(spark, monkeypatch):
    """Review r10: callers that pre-cache an exactly-(src,dst)-bigint
    edge list (the catalog query does, to materialize the edge build)
    used to have it re-cast and RE-CACHED inside label_propagation —
    the query's biggest cached artifact duplicated in executor storage
    plus one wasted materialization pass.  Reused caches must (a) not
    be cached again edge-sized, (b) stay alive for the caller — the
    function must not unpersist what it does not own."""
    import pyspark.sql.functions as F
    probe = spark.range(1)
    df_cls = type(probe)
    cached, released = [], []
    real_cache, real_unpersist = df_cls.cache, df_cls.unpersist

    def spy_cache(self):
        cached.append(self)
        return real_cache(self)

    def spy_unpersist(self, blocking=False):
        released.append(self)
        return real_unpersist(self, blocking)

    monkeypatch.setattr(df_cls, "cache", spy_cache)
    monkeypatch.setattr(df_cls, "unpersist", spy_unpersist)

    edges = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 2)]).select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    ).cache()
    edges.count()
    got = dict(map(tuple, label_propagation(edges, iters=1).collect()))
    assert got == {1: 2, 2: 1, 3: 2}
    # the caller's cache must still be alive (not unpersisted by the
    # function) and no second edge-shaped cache may have been created:
    # every cache the function made is node-sized (nodes / rounds), and
    # each of those was released
    assert edges.is_cached, "function unpersisted a cache it did not own"
    inner = [d for d in cached[1:] if d is not edges]
    leaked = [d for d in inner if d not in released]
    assert not leaked, f"{len(leaked)} function-made cache(s) leaked"
    # identity check: the function never called .cache() on a frame
    # whose schema is the raw (src,dst) edge shape — the reuse branch
    # skipped the recast cache entirely
    edge_shaped = [
        d for d in inner
        if [f.name for f in d.schema.fields] == ["src", "dst"]
        and "label" not in d.columns
    ]
    assert not edge_shaped, "edge list was re-cached despite reuse"
    edges.unpersist()
