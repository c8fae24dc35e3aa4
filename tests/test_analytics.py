"""Unit + plan-shape tests for the analytics catalog (window functions,
range join, native session windows, grouping sets). Value parity with
DuckDB is covered by test_oracle_parity; these pin operator semantics on
hand-built inputs and the plan shapes that matter at 100 TB."""

import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark import catalog
from starryskyqueryengine_spark.operators.rangejoin import interval_count_join

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- range join

def _probe_build(spark):
    probe = spark.createDataFrame(
        [(1, 1_000_000), (2, 10_000_000), (3, 100)], "pid long, ts long"
    )
    build = spark.createDataFrame(
        [(900_000,), (1_000_000,), (1_000_001,), (9_500_000,), (50,)],
        "ts long",
    )
    return probe, build


def test_interval_count_join_semantics(spark):
    """Window is half-open (lo, ts]: build rows strictly after ts-width
    and at-or-before ts count; rows outside contribute nothing; probes
    with no matches survive with count 0."""
    probe, build = _probe_build(spark)
    out = interval_count_join(probe, build, "ts", "ts", width_us=1_000_000)
    got = {r["pid"]: r["n_in_range"] for r in out.collect()}
    # pid 1 @1M: (0, 1M] -> 50, 900k, 1M (1.000001M excluded as > ts)
    # pid 2 @10M: (9M, 10M] -> 9.5M only
    # pid 3 @100: (-999900, 100] -> 50 only
    assert got == {1: 3, 2: 1, 3: 1}


def test_interval_count_join_no_nested_loop(spark):
    """The bucketed rewrite must plan as an equi-join (hash/sort-merge),
    never BroadcastNestedLoopJoin — that is the whole point of the
    operator at scale."""
    probe, build = _probe_build(spark)
    out = interval_count_join(probe, build, "ts", "ts", width_us=1_000_000)
    plan = plan_of(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_count_join_bucket_boundary(spark):
    """A build row exactly on the probe's bucket boundary (different
    bucket than the probe) is still found via the exploded lo-bucket."""
    probe = spark.createDataFrame([(1, 2_000_000)], "pid long, ts long")
    build = spark.createDataFrame([(1_000_001,), (1_999_999,)], "ts long")
    out = interval_count_join(probe, build, "ts", "ts", width_us=1_000_000)
    assert out.collect()[0]["n_in_range"] == 2


# ------------------------------------------------------- native session window

def test_session_window_gap_semantics(spark):
    """Events exactly gap-apart start a NEW session (Spark merges only
    when the next event is strictly inside the previous window); events
    inside the gap merge, and the window end extends gap past the last
    event."""
    gap_us = 30 * 60 * 1_000_000
    rows = [
        (1, 0),
        (1, gap_us - 1),          # merges (strictly inside)
        (1, 2 * gap_us - 1 + gap_us),  # exactly gap after prev end -> new session
        (2, 0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long").select(
        "user_id", F.timestamp_micros("ts_us").alias("ts")
    )
    sess = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("s"),
            F.unix_micros("w.end").alias("e"),
            "n",
        )
    )
    got = sorted((r["user_id"], r["s"], r["e"], r["n"]) for r in sess.collect())
    assert got == [
        (1, 0, 2 * gap_us - 1, 2),
        (1, 3 * gap_us - 1, 4 * gap_us - 1, 1),
        (2, 0, gap_us, 1),
    ]


# ---------------------------------------------------------------- plan shapes

def test_q6_filters_pushed_to_scan(spark):
    """Q6's whole WHERE clause must reach the parquet scan."""
    q = catalog.get_queries()["q6_revenue_delta"]
    plan = plan_of(q(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan


def test_q4_plans_semi_join(spark):
    """The EXISTS must stay a semi join (never materialize lineitem)."""
    q = catalog.get_queries()["q4_order_priority"]
    plan = plan_of(q(spark, SF_DIR))
    assert "LeftSemi" in plan


def test_window_family_single_window_node(spark):
    """row_number/lag/running-sum share one partition+sort: exactly one
    Window node and at most one Sort in the executed plan."""
    q = catalog.get_queries()["window_user_activity"]
    plan = plan_of(q(spark, SF_DIR))
    assert plan.count("Window ") <= 2  # header line per Window node
    assert plan.count("Exchange") <= 2  # one shuffle for the window (+AQE read)


def test_rollup_single_expand_aggregate(spark):
    """ROLLUP plans one Expand + one aggregate pass, not a union of
    per-level scans."""
    q = catalog.get_queries()["rollup_revenue"]
    plan = plan_of(q(spark, SF_DIR))
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1


def test_pivot_no_extra_distinct_job(spark):
    """Pivot with explicit values compiles to conditional aggregates in
    one pass — a single scan of orders."""
    q = catalog.get_queries()["pivot_segment_priority"]
    plan = plan_of(q(spark, SF_DIR))
    assert plan.count("Scan parquet") == 2  # orders + broadcast customer
    assert "BroadcastHashJoin" in plan


def test_vocab_topk_plans_take_ordered(spark):
    """Global top-k vocabulary must plan TakeOrderedAndProject after the
    term aggregate — not a full sort of the vocabulary."""
    q = catalog.get_queries()["vocab_top_terms"]
    plan = plan_of(q(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_tfidf_broadcasts_small_sides(spark):
    """The df (vocabulary) and corpus-count sides must broadcast — the
    only non-broadcast shuffles are the two term aggregations."""
    q = catalog.get_queries()["tfidf_top_terms"]
    plan = plan_of(q(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_pack_sequences_no_global_corpus_window(spark):
    """The corpus-wide cumsum must run as per-shard windows (hash
    partitioning on the shard key); only the tiny shard-totals table may
    pass through a single-partition exchange."""
    q = catalog.get_queries()["pack_sequences"]
    plan = plan_of(q(spark, SF_DIR))
    assert "hashpartitioning(_shard" in plan
    # the doc-bearing side never collapses to one partition: the
    # single-partition exchanges sit above the per-shard aggregate
    assert "Scan parquet" in plan


def test_approx_percentile_tracks_exact_within_tolerance(spark):
    """percentile_prices documents approx_percentile as the 100 TB path;
    pin that the t-digest sketch actually lands within 1% relative error
    of the exact quantiles on the fixtures, per group."""
    from pyspark.sql import functions as F

    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    pcts = [0.5, 0.9, 0.99]
    exact = l.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.array(*[F.lit(p) for p in pcts])).alias("q")
    )
    approx = l.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", F.array(*[F.lit(p) for p in pcts]), F.lit(10000)
        ).alias("q")
    )
    e = {r["l_returnflag"]: r["q"] for r in exact.collect()}
    a = {r["l_returnflag"]: r["q"] for r in approx.collect()}
    assert e.keys() == a.keys()
    for k in e:
        for ev, av in zip(e[k], a[k]):
            assert abs(av - ev) / max(abs(ev), 1e-9) < 0.01, (k, ev, av)


# ---------------------------------------------------------------- pagerank


def test_pagerank_dangling_mass_is_conserved(spark):
    """On a graph with dangling nodes, the scaled rank total must stay
    ~PR_SCALE (leaked only by integer-division remainders), and dangling
    targets must accumulate more rank than isolated-source behavior
    would give them."""
    from starryskyqueryengine_spark.functions.graph import PR_SCALE, pagerank

    # star: 1->2, 1->3, 4->2 ; nodes 2,3 dangling
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 2)], "src long, dst long"
    )
    ranks, it = pagerank(edges, max_iters=5)
    total = sum(r["r"] for r in ranks.collect())
    assert it == 5
    # remainder leakage is bounded by ~(n_nodes + 2) per iteration step
    assert abs(total - PR_SCALE) < 10_000, total
    by_node = {r["node"]: r["r"] for r in ranks.collect()}
    assert by_node[2] > by_node[3] > 0  # 2 has two in-edges, 3 one
    assert by_node[1] > 0  # no in-edges: teleport + dangling share only


def test_pagerank_convergence_stop(spark):
    """tol_scaled stops iteration early, and the early-stopped result
    equals the fixed-iteration run at the stop count (determinism)."""
    from starryskyqueryengine_spark.functions.graph import pagerank

    # 2-cycle converges immediately after the first iteration
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    ranks_tol, it_tol = pagerank(edges, max_iters=50, tol_scaled=0)
    assert it_tol < 50, "never converged"
    ranks_fixed, _ = pagerank(edges, max_iters=it_tol)
    assert sorted(map(tuple, ranks_tol.collect())) == sorted(
        map(tuple, ranks_fixed.collect())
    )


def test_pagerank_no_dangling_matches_specialized_form(spark):
    """On a graph where every node has out-edges the general operator
    must agree with the inner-join specialized update (no dangling
    aggregate fires)."""
    from starryskyqueryengine_spark.functions.graph import PR_SCALE, pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src long, dst long"
    )
    ranks, _ = pagerank(edges, max_iters=3)
    got = {r["node"]: r["r"] for r in ranks.collect()}
    # replay in exact integer python
    nodes = [1, 2, 3]
    outdeg = {1: 2, 2: 1, 3: 1}
    inedges = {1: [3], 2: [1], 3: [2, 1]}
    base = PR_SCALE // 3
    r = {n: base for n in nodes}
    for _ in range(3):
        c = {n: r[n] // outdeg[n] for n in nodes}
        r = {
            n: (15 * base + 85 * sum(c[u] for u in inedges[n])) // 100
            for n in nodes
        }
    assert got == r


def test_pagerank_empty_graph(spark):
    from starryskyqueryengine_spark.functions.graph import pagerank

    edges = spark.createDataFrame([], "src long, dst long")
    ranks, it = pagerank(edges, max_iters=3)
    assert ranks.count() == 0 and it == 0


# ---------------------------------------------------------- heavy hitters


def test_misra_gries_superset_guarantee_under_eviction(spark):
    """With k far below the distinct count (evictions constantly fire),
    every item with true count > n/k must still appear in the union of
    partition summaries."""
    from starryskyqueryengine_spark.functions.sketches import (
        misra_gries_candidates,
    )

    # 4 heavy items (1000 each) drowned in 20k distinct singletons
    rows = [(f"h{i % 4}",) for i in range(4000)] + [
        (f"noise{i}",) for i in range(20000)
    ]
    df = spark.createDataFrame(rows, "term string").repartition(8)
    k = 50
    cands = {
        r["term"] for r in misra_gries_candidates(df, "term", k).collect()
    }
    n = 24000
    for i in range(4):
        assert f"h{i}" in cands, f"heavy item h{i} evicted (k={k}, n/k={n/k})"


def test_heavy_hitters_exact_matches_naive_groupby(spark):
    from pyspark.sql import functions as F

    from starryskyqueryengine_spark.functions.sketches import (
        heavy_hitters_exact,
    )

    rows = [(f"h{i % 3}",) for i in range(900)] + [
        (f"m{i % 50}",) for i in range(500)
    ] + [(f"n{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "term string").repartition(7)
    thr = lambda n: n // 100  # 1% support
    got = sorted(
        map(tuple, heavy_hitters_exact(df, "term", thr).collect())
    )
    want = sorted(
        map(
            tuple,
            df.groupBy(F.col("term"))
            .agg(F.count("*").cast("bigint").alias("n"))
            .filter(F.col("n") >= thr(3400))
            .collect(),
        )
    )
    assert got == want and len(got) >= 3


def test_heavy_hitters_exact_is_partitioning_independent(spark):
    from starryskyqueryengine_spark.functions.sketches import (
        heavy_hitters_exact,
    )

    rows = [(f"x{i % 10}",) for i in range(1000)]
    a = spark.createDataFrame(rows, "term string").repartition(1)
    b = spark.createDataFrame(rows, "term string").repartition(13)
    thr = lambda n: n // 20
    assert sorted(map(tuple, heavy_hitters_exact(a, "term", thr).collect())) == \
        sorted(map(tuple, heavy_hitters_exact(b, "term", thr).collect()))


def test_unimax_waterfilling_invariants(spark):
    """UniMax allocation must satisfy the water-filling contract on the
    real fixture: 0 <= alloc <= cap, budget exhausted up to integer
    slack < |sources|, and below-waterline sources get their FULL cap
    (the regression guard for the min-vs-max waterline selection, which
    engine parity alone cannot catch because the oracle mirrors the
    formula)."""
    from starryskyqueryengine_spark.catalog import get_queries
    from starryskyqueryengine_spark.catalog_mixture import (
        UNIMAX_BUDGET_NUM,
        UNIMAX_EPOCH_CAP,
    )

    rows = get_queries()["unimax_allocation"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    total_tokens = sum(r["t_src"] for r in rows)
    budget = UNIMAX_BUDGET_NUM * total_tokens
    allocs = [r["alloc_tokens"] for r in rows]
    caps = [r["cap_tokens"] for r in rows]
    assert all(0 <= a <= c for a, c in zip(allocs, caps))
    assert all(c == UNIMAX_EPOCH_CAP * r["t_src"] for c, r in zip(caps, rows))
    slack = budget - sum(allocs)
    assert 0 <= slack <= len(rows), (budget, sum(allocs))
    # every source NOT at its cap sits exactly at the common waterline
    waterline = {a for a, c in zip(allocs, caps) if a < c}
    assert len(waterline) <= 1
    # epochs never exceed the cap
    assert all(r["epochs_milli"] <= UNIMAX_EPOCH_CAP * 1000 for r in rows)


def test_interval_count_join_preserves_duplicate_probe_rows(spark):
    """Two IDENTICAL probe rows must come back as two rows with the
    same count — the old groupBy over probe columns merged them and
    SUMMED their counts (one row with 6 instead of two with 3)."""
    probe = spark.createDataFrame([(1_000_000,), (1_000_000,)], "ts long")
    build = spark.createDataFrame(
        [(400_000,), (600_000,), (900_000,)], "ts long"
    )
    out = interval_count_join(probe, build, "ts", "ts", width_us=1_000_000)
    rows = sorted((r["ts"], r["n_in_range"]) for r in out.collect())
    assert rows == [(1_000_000, 3), (1_000_000, 3)]


def test_heavy_hitters_phi_path_two_scans_and_typed_terms(spark):
    """Review r9: (a) with phi given, the sketch is sized n-free and the
    total count rides pass 1 — results must equal both the legacy path
    and a naive groupBy; (b) a BIGINT term column (token-id corpora)
    must sketch as naturally as strings — the old hardcoded 'term
    string' schema failed in the Arrow serializer; (c) a threshold
    mapping below phi*n is rejected (the superset guarantee would not
    cover it)."""
    import pytest
    from pyspark.sql import functions as F

    from starryskyqueryengine_spark.functions.sketches import (
        heavy_hitters_exact,
        misra_gries_candidates,
    )

    rows = [(f"h{i % 3}",) for i in range(900)] + [
        (f"n{i}",) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "term string").repartition(7)
    thr = lambda n: n // 100
    legacy = sorted(map(tuple, heavy_hitters_exact(df, "term", thr).collect()))
    fast = sorted(map(tuple,
                      heavy_hitters_exact(df, "term", thr, phi=0.01).collect()))
    assert fast == legacy and len(fast) == 3

    # bigint term column end to end (both the sketch and the operator)
    irows = [(i % 5,) for i in range(1000)] + [(1000 + i,) for i in range(500)]
    idf = spark.createDataFrame(irows, "tok long").repartition(5)
    sk = misra_gries_candidates(idf, "tok", 20)
    assert dict(sk.dtypes)["term"] == "bigint"
    got = sorted(map(tuple,
                     heavy_hitters_exact(idf, "tok", lambda n: n // 50,
                                         phi=0.02).collect()))
    want = sorted(map(tuple,
                      idf.groupBy(F.col("tok").alias("term"))
                      .agg(F.count("*").cast("bigint").alias("n"))
                      .filter(F.col("n") >= 1500 // 50).collect()))
    assert got == want and len(got) == 5

    with pytest.raises(ValueError, match="below phi"):
        heavy_hitters_exact(df, "term", lambda n: max(1, n // 1000),
                            phi=0.01).collect()


def test_heavy_hitters_phi_empty_input_typed(spark):
    """Empty input returns an empty frame whose term column keeps the
    INPUT type on both paths (the old branch hardcoded string)."""
    from starryskyqueryengine_spark.functions.sketches import (
        heavy_hitters_exact,
    )

    empty = spark.createDataFrame([], "tok long")
    for kwargs in ({}, {"phi": 0.01}):
        out = heavy_hitters_exact(empty, "tok", lambda n: n // 10, **kwargs)
        assert out.count() == 0
        assert dict(out.dtypes)["term"] == "bigint"
