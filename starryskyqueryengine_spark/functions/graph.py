"""Distributed iterative graph algorithms (PageRank) in exact
fixed-point arithmetic.

The reference has no graph operator; this generalizes the round-5
``pagerank_part_supplier`` catalog query (which relied on its bipartite
construction guaranteeing no dangling nodes) into a reusable
``pagerank(edges)`` that handles ANY directed edge list:

- **Dangling-mass redistribution** (Brin & Page 1998 §2.1.1 as
  popularized; see also the "Deeper Inside PageRank" treatment): a node
  with no out-edges would leak its rank mass from the system every
  iteration; instead its mass is redistributed uniformly to all nodes,
  keeping the scaled total conserved up to integer-division remainders.
- **Convergence-based stop**: optionally stop when the exact L1 delta
  ``sum(|r_new - r_old|)`` falls to ``tol_scaled`` (a BIGINT sum —
  bit-exact on any cluster), instead of a fixed iteration count.
- **ENGINE-EXACT determinism**: ranks are fixed-point BIGINT at
  ``scale``; every step is integer multiply/divide (Spark ``div`` ==
  DuckDB ``//`` on non-negative BIGINT), so results are independent of
  partition order and comparable bit-for-bit against an unrolled SQL
  oracle.

100 TB shape: the edge list is cached and re-scanned once per
iteration; the |nodes|-sized (src, contribution) table joins into it
**broadcast only when it provably fits** (see ``_gate_broadcast``), so
each iteration costs one edge pass plus one map-side-combined
aggregate — never an edge-sized shuffle join build when the node table
is small, and never a driver-OOM broadcast of a billion-row node table
when it is not.  The dangling mass is one tiny aggregate over the rank
table (skipped entirely when the graph has no dangling node), and the
L1 delta is one more (skipped when ``tol_scaled`` is None).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12

# Node-sized iteration state (rank / distance / label tables, two
# BIGINT columns ≈ 16 B/row + row overhead) is broadcast only below
# this row count: 4M rows ≈ 100-200 MB serialized — comfortably inside
# executor memory on any reasonable cluster, far below the 8 GB
# broadcast hard cap.  Above it the join falls back to a shuffle hash /
# sort-merge join picked by Catalyst+AQE (which can still promote to
# broadcast at runtime if post-filter stats allow).  Same adaptive
# philosophy as ``connected_components``'s driver/distributed split
# (functions/dedup.py): pick the small-side fast path only when the
# size is KNOWN to be small.
BROADCAST_MAX_NODES = 4_000_000

# label_propagation plan-sever cadence: intermediate rounds persist with
# plain cache() (no RDD-boundary job) and every k-th round
# localCheckpoints to cut the ~4^rounds logical-plan growth.  4 bounds
# the inter-sever plan tree at 4^3 = 64 references of the last
# LogicalRDD — constant in iters — while amortizing the checkpoint tax
# over four rounds (r10; per-round checkpointing cost ~15% at sf0.1).
_LP_SEVER_EVERY = 4


def _gate_broadcast(df: DataFrame, n_rows: int, max_rows: int) -> DataFrame:
    """Broadcast-hint ``df`` only when its known row bound fits.

    ``n_rows`` must be a proven upper bound on ``df``'s row count
    (e.g. |V| for any node-keyed table).  At 100× scale an
    unconditional ``F.broadcast`` of a node-sized table is a driver
    OOM / broadcast-size abort; an unconditional shuffle join wastes
    the common small-graph case.  Gating on the bound keeps both.
    """
    return F.broadcast(df) if n_rows <= max_rows else df


def pagerank(
    edges: DataFrame,
    max_iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    tol_scaled: int | None = None,
    broadcast_max_nodes: int = BROADCAST_MAX_NODES,
) -> tuple[DataFrame, int]:
    """PageRank over a directed ``(src, dst)`` BIGINT edge list.

    Returns ``(ranks, iterations_run)`` where ranks has columns
    ``node`` (bigint) and ``r`` (bigint, fixed-point at ``scale``).

    Per-iteration update, all integer ops::

        dm_per  = (sum of r over dangling nodes) div n_nodes
        r'(v)   = ((100 - d) * base
                   + d * (sum_{u->v} r(u) div outdeg(u) + dm_per)) div 100

    with ``base = scale div n_nodes`` and ``d = damping_pct``.  Nodes
    with no in-edges keep the teleport + dangling term (left join, not
    inner).  With ``tol_scaled`` set, iteration stops as soon as the
    exact L1 delta is <= tol_scaled.

    ``broadcast_max_nodes`` gates every node-sized broadcast (deg,
    dangling, contribution tables — all bounded by |V|, which is
    already counted for ``base``); above it Catalyst/AQE picks the
    join strategy.  Results are identical either way.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    edges = edges.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    ).cache()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0).cast("bigint").alias("r")), 0
    base = scale // n_nodes
    teleport = (100 - damping_pct) * base

    def gate(df: DataFrame) -> DataFrame:
        # every gated table here is node-keyed -> bounded by |V|
        return _gate_broadcast(df, n_nodes, broadcast_max_nodes)

    # dangling = nodes with no out-edge; resolved ONCE (the set is a
    # property of the edge list, only the MASS changes per iteration)
    dangling = nodes.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).cache()
    has_dangling = dangling.limit(1).count() > 0
    if not has_dangling:
        dangling.unpersist()

    # Materialization policy: per-round driver collects (the dangling
    # mass, the L1 delta) re-execute the rank lineage each time they
    # run, so WHEN ANY COLLECT EXISTS each round's ranks are cached —
    # the round's own collect (tol) or the next round's dangling
    # aggregate populates the cache, and later scans read the
    # materialized node-sized table instead of replaying rounds 1..k-1.
    # When NO collect exists (no dangling node, no tolerance), the rank
    # table is referenced exactly ONCE per round — a linear lazy chain
    # the caller's single action executes end to end, so per-round
    # cache+count jobs are pure overhead (round-7 bench regression);
    # only a periodic localCheckpoint bounds plan depth for large
    # max_iters.
    per_round_collect = tol_scaled is not None
    ranks = nodes.select("node", F.lit(base).cast("bigint").alias("r"))
    if has_dangling:
        per_round_collect = True
    if per_round_collect:
        ranks = ranks.cache()
    iters_run = 0
    for _it in range(max_iters):
        dm_per = 0
        if has_dangling:
            dm = (
                ranks.join(gate(dangling), "node", "left_semi")
                .agg(F.sum("r").alias("s"))
                .collect()[0]["s"]
            )
            dm_per = int(dm or 0) // n_nodes
        csrc = (
            ranks.join(gate(deg), ranks["node"] == deg["src"])
            .select("src", F.expr("r div outdeg").alias("c"))
        )
        contribs = (
            edges.join(gate(csrc), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.expr(
                    f"cast(({teleport} + {damping_pct} * "
                    f"(coalesce(s, 0L) + {dm_per})) div 100 as bigint)"
                ).alias("r"),
            )
        )
        if per_round_collect:
            new_ranks = new_ranks.cache()
        elif (_it + 1) % 8 == 0:
            # lazy chain: truncate the growing logical plan periodically
            # (analyzer cost, not execution cost — nothing re-runs)
            new_ranks = new_ranks.localCheckpoint(eager=True)
        if tol_scaled is not None:
            # exact L1 delta: BIGINT sum, partition-order independent —
            # this collect is also the job that populates new_ranks's
            # cache, so the parent can be dropped right after
            delta = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "node")
                .agg(F.sum(F.abs(F.col("n.r") - F.col("o.r"))).alias("d"))
                .collect()[0]["d"]
            )
            ranks.unpersist()
            ranks = new_ranks
            iters_run += 1
            if int(delta or 0) <= tol_scaled:
                break
        else:
            if per_round_collect:
                # dangling-only rounds have no collect of their own this
                # round: populate the new cache BEFORE unpersisting the
                # parent, else the next round's dangling aggregate
                # replays the whole multi-round lineage through the
                # dropped caches (quadratic recompute)
                new_ranks.count()
                ranks.unpersist()
            ranks = new_ranks
            iters_run += 1
    if per_round_collect:
        # the loop materialized every round, so the final table is
        # node-sized data sitting behind edge-list-sized caches: sever
        # the lineage and DROP those caches — without this every
        # pagerank call pinned edges/deg/nodes/dangling in executor
        # storage for the rest of the session
        return _finalize(ranks, edges, deg, nodes,
                         *( [dangling] if has_dangling else [] ),
                         ranks), iters_run
    # pure-lazy path: the caller's single action executes the chain; the
    # caches are load-bearing for it and free at driver GC of the result
    return ranks, iters_run


def _finalize(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Sever a materialized loop result from its caches: one eager
    localCheckpoint copies the (node-sized) result, then every cached
    input/intermediate is unpersisted — repeated graph calls no longer
    accumulate edge-list-sized executor storage.  The checkpoint's own
    blocks free at driver GC of the returned frame (same discipline as
    connected_components)."""
    out = result.localCheckpoint(eager=True)
    for df in cached:
        try:
            df.unpersist()
        except Exception:
            pass
    return out


def sssp_bounded(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    broadcast_max_nodes: int = BROADCAST_MAX_NODES,
) -> DataFrame:
    """Hop-bounded single-source(-set) shortest paths — synchronous
    Bellman-Ford over a weighted ``(src, dst, w)`` BIGINT edge list.

    ``sources`` is a DataFrame with a ``node`` column (distance 0).
    Returns ``(node, dist)`` for every node reachable within
    ``max_hops`` relaxation rounds; with ``max_hops >= |V| - 1`` this is
    the exact SSSP fixed point (non-negative weights assumed only for
    the usual "bounded = exact" argument — the relaxation itself is
    plain Bellman-Ford and tolerates any weights).

    ENGINE-EXACT: distances are BIGINT sums and the per-round combine is
    ``min`` — associative/commutative, so results are independent of
    partition order and bit-comparable against an unrolled SQL oracle
    (same policy as :func:`pagerank`).

    100 TB shape: the edge list is cached once; each round joins the
    CURRENT distance table (node-sized, broadcast only when |V| is
    under ``broadcast_max_nodes`` — one upfront distinct-count buys the
    proof) into the edge scan, aggregates a min per dst, and unions
    with the previous table through one more min — two
    map-side-combinable aggregates per round, never an edge×edge
    product.  Frontier-only optimization (join just the nodes whose
    dist changed) drops in by filtering the relax input; omitted here
    to keep the oracle replayable row-for-row.
    """
    edges = edges.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
        F.col("w").cast("bigint").alias("w"),
    ).cache()
    dist = sources.select(
        F.col("node").cast("bigint").alias("node"),
        F.lit(0).cast("bigint").alias("dist"),
    ).distinct()
    # |V ∪ sources| bounds every per-round dist table (sources may seed
    # nodes absent from the edge list — without them the "proven upper
    # bound" the broadcast gate relies on could be exceeded); one count
    # decides the broadcast strategy for the whole run (same pattern as
    # pagerank, which needs the count anyway).
    n_nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .unionByName(dist.select("node"))
        .distinct()
        .count()
    )
    prev = None
    for i in range(max_hops):
        relaxed = (
            edges.join(
                _gate_broadcast(
                    dist.withColumnRenamed("node", "src"),
                    n_nodes,
                    broadcast_max_nodes,
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        # materialize each round (node-sized) and drop the previous:
        # without this, round k's broadcast re-evaluates rounds 1..k-1
        # — the classic iterative-lineage blowup (same discipline as
        # pagerank's cached edge list)
        dist = dist.cache()
        dist.count()
        if prev is not None:
            prev.unpersist()
        prev = dist
    return _finalize(dist, edges, dist)


def label_propagation(
    edges: DataFrame,
    iters: int,
    broadcast_max_nodes: int = BROADCAST_MAX_NODES,
    frontier_sizes: list | None = None,
) -> DataFrame:
    """Synchronous label propagation for community detection (Raghavan
    et al. 2007), determinized: every node starts labeled with its own
    id; each round, a node adopts the most frequent label among its
    IN-neighbors (pass an undirected graph as both edge directions),
    breaking frequency ties by the SMALLEST label; isolated-round nodes
    (no in-edges) keep their label.  The min-tie-break plus synchronous
    update makes the whole run a pure function of the edge list —
    partition-order independent and replayable by an unrolled SQL
    oracle, unlike the textbook random-order variant.

    Returns ``(node, label)`` after ``iters`` rounds (stopping early at
    the fixed point — once a round changes no label, every later round
    is the identity, so early stop is exact).

    **Frontier-optimized** (round 2+): a node's new label is a pure
    function of its in-neighbors' labels, so only nodes with at least
    one in-neighbor whose label changed last round can change this
    round.  Each round therefore (a) semi-joins the edge list down to
    edges whose ``src`` changed, (b) takes the distinct ``dst`` set as
    the recompute frontier, (c) recomputes the argmax over ALL in-edges
    of just those nodes — bit-identical to the full recompute, but the
    per-round cost decays with the frontier instead of staying
    O(|E|).  Round 1's frontier is every node (identical to the
    unoptimized form).  ``frontier_sizes``, when passed, receives the
    per-round changed-node counts (test hook for pinning shrink).

    100 TB shape per round: one frontier semi-join + one edge-scan join
    carrying the node-sized label table (each broadcast only when |V|
    fits ``broadcast_max_nodes``; above it Catalyst/AQE picks the
    strategy), one (dst, label) count aggregate, one deterministic
    arg-max via max_by over a (count, -label) struct — shuffles are
    node-sized, edge data never reshuffles (cached scan)."""
    # Edge-cache ownership (review r10): callers routinely cache the
    # edge list themselves (the catalog queries count it to materialize
    # the build).  Re-casting + re-caching here DUPLICATED the edge
    # list in executor storage — the single biggest cached artifact of
    # the whole query, doubled for no reason — and paid one extra full
    # materialization pass.  When the input is already exactly
    # (src,dst) bigint AND cached, reuse the caller's cache and leave
    # its lifetime to the caller; otherwise build (and own) the recast
    # cache as before.
    _reusable = (
        [f.name for f in edges.schema.fields] == ["src", "dst"]
        and all(f.dataType.simpleString() == "bigint"
                for f in edges.schema.fields)
    )
    owns_edges = not (_reusable and edges.is_cached)
    if owns_edges:
        edges = edges.select(
            F.col("src").cast("bigint").alias("src"),
            F.col("dst").cast("bigint").alias("dst"),
        ).cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()

    def gate(df: DataFrame) -> DataFrame:
        # node-keyed tables only — bounded by |V|
        return _gate_broadcast(df, n_nodes, broadcast_max_nodes)

    # seed labels are a projection of the CACHED nodes table — no cache
    # of their own (each round's result is localCheckpoint-materialized
    # below, so nothing ever replays round 0 through lineage)
    labels = nodes.select("node", F.col("node").alias("label"))
    if iters <= 0:
        # no round will run: labels is still a lazy projection over the
        # cached nodes table — sever it before the caches drop.  Every
        # looped exit below leaves labels on the last round's
        # LogicalRDD, which depends on NO cache, so this is the only
        # path that needs _finalize's checkpoint copy.
        return _finalize(labels, *([edges] if owns_edges else []), nodes)
    # changed = nodes whose label changed last round (round 1: all)
    changed: DataFrame | None = None  # None = first round, frontier is V
    n_changed = n_nodes  # round 1's frontier is every node
    _pinned: list[DataFrame] = []  # cache-backed rounds since last sever
    for i in range(iters):
        # Adaptive cutoff (round-7 verdict #6): while the changed set is
        # still a large fraction of V, the two frontier semi-joins cost
        # ~O(|E|) themselves and prune little — the full recompute is
        # strictly cheaper.  The frontier machinery only pays once the
        # frontier has actually shrunk; bit-identical either way (the
        # frontier path recomputes the same argmaxes the full path does,
        # unchanged nodes keep their label through the coalesce).
        if changed is None or 2 * n_changed >= n_nodes:
            aff_edges = edges  # frontier ~ V: full recompute is cheaper
        else:
            # edges whose source changed -> their dsts form the
            # frontier; then ALL in-edges of those dsts (the argmax
            # needs the full neighborhood, not just changed sources)
            frontier = (
                edges.join(
                    gate(changed.withColumnRenamed("node", "src")),
                    "src",
                    "left_semi",
                )
                .select(F.col("dst").alias("node"))
                .distinct()
            )
            aff_edges = edges.join(
                gate(frontier.withColumnRenamed("node", "dst")),
                "dst",
                "left_semi",
            )
        counts = (
            aff_edges.join(
                gate(labels.withColumnRenamed("node", "src")), "src"
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winner = counts.groupBy("node").agg(
            F.max_by(
                "label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
            ).alias("new_label")
        )
        new_labels = (
            labels.join(winner, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
                # changed-flag rides the SAME projection — the old and new
                # labels are both in scope here, so the changed set costs
                # a filter on this cached frame instead of a second
                # node-sized join per round
                (
                    F.col("new_label").isNotNull()
                    & (F.col("new_label") != F.col("label"))
                ).alias("_chg"),
            )
        )
        # Node-sized materialization per round; plan-sever every k-th
        # round (r10, was every round).  cache() truncates EXECUTION
        # but not the LOGICAL plan: each round references the previous
        # round's plan up to four times (counts, join-back, changed
        # semi-join, frontier), so unsevered plan trees grow ~4^rounds
        # — at iters=10 the driver OOMed merely stringifying the tree
        # for the cache name.  Per-round localCheckpoint fixed that but
        # taxed every round with an RDD-boundary job (r9 bench: 6.84 ->
        # 7.91 s); now intermediate rounds use plain cache (the
        # n_changed count below is the materializing action) and only
        # every _LP_SEVER_EVERY-th round — plus every EXIT path, so the
        # returned frame never leans on a soon-unpersisted cache —
        # localCheckpoints to a LogicalRDD.  Plan depth between severs
        # is bounded by 4^(_LP_SEVER_EVERY-1) references of the last
        # LogicalRDD: constant in iters, trivial to stringify.
        last_round = i == iters - 1
        if last_round or (i + 1) % _LP_SEVER_EVERY == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
            for c in _pinned:
                c.unpersist()
            _pinned.clear()
        else:
            new_labels = new_labels.cache()
            _pinned.append(new_labels)
        labels = new_labels.select("node", "label")
        if last_round and frontier_sizes is None:
            # final round: n_changed only feeds early stop, the next
            # round's frontier, and the test hook — none exist now, so
            # skip the changed-set count entirely
            break
        # the flag was computed inside new_labels' projection: the
        # changed set is a filter over the already-materialized round
        # result — no second node-sized join (counting it also populates
        # a cache-backed round's blocks — the materializing action)
        changed = new_labels.filter(F.col("_chg")).select("node")
        n_changed = changed.count()
        if frontier_sizes is not None:
            frontier_sizes.append(n_changed)
        if n_changed == 0:
            # fixed point: round k+1's inputs equal round k's, so all
            # remaining rounds are the identity — exact early stop.
            # This exit can land between severs: checkpoint before the
            # pinned caches (and edges/nodes below) are released.
            if _pinned:
                labels = labels.localCheckpoint(eager=True)
                for c in _pinned:
                    c.unpersist()
                _pinned.clear()
            break
    if owns_edges:
        edges.unpersist()
    nodes.unpersist()
    return labels
