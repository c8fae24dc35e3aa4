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
iteration; the |nodes|-sized (src, contribution) table is broadcast
into it, so each iteration costs one edge pass plus one map-side-
combined aggregate — never an edge-sized shuffle join build.  The
dangling mass is one tiny aggregate over the rank table (skipped
entirely when the graph has no dangling node), and the L1 delta is one
more (skipped when ``tol_scaled`` is None).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    max_iters: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    tol_scaled: int | None = None,
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

    # dangling = nodes with no out-edge; resolved ONCE (the set is a
    # property of the edge list, only the MASS changes per iteration)
    dangling = nodes.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).cache()
    has_dangling = dangling.limit(1).count() > 0

    # Per-round materialization (same discipline as sssp_bounded /
    # label_propagation below): each round's ranks are cached and
    # counted so the round's two driver collects (dangling mass, L1
    # delta) and the next round's joins all read ONE materialized
    # node-sized table instead of re-evaluating the whole multi-round
    # lineage — without this, round k's lineage embeds rounds 1..k-1
    # and every collect replays it.
    ranks = nodes.select("node", F.lit(base).cast("bigint").alias("r")).cache()
    iters_run = 0
    for _ in range(max_iters):
        dm_per = 0
        if has_dangling:
            dm = (
                ranks.join(F.broadcast(dangling), "node", "left_semi")
                .agg(F.sum("r").alias("s"))
                .collect()[0]["s"]
            )
            dm_per = int(dm or 0) // n_nodes
        csrc = (
            ranks.join(F.broadcast(deg), ranks["node"] == deg["src"])
            .select("src", F.expr("r div outdeg").alias("c"))
        )
        contribs = (
            edges.join(F.broadcast(csrc), "src")
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
        new_ranks = new_ranks.cache()
        if tol_scaled is None:
            # no delta collect this round — materialize explicitly so the
            # next round reads the cache, not the compounding lineage
            new_ranks.count()
        if tol_scaled is not None:
            # exact L1 delta: BIGINT sum, partition-order independent
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
            ranks.unpersist()
            ranks = new_ranks
            iters_run += 1
    return ranks, iters_run


def sssp_bounded(
    edges: DataFrame, sources: DataFrame, max_hops: int
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
    CURRENT distance table (node-sized, broadcast when it fits) into the
    edge scan, aggregates a min per dst, and unions with the previous
    table through one more min — two map-side-combinable aggregates per
    round, never an edge×edge product.  Frontier-only optimization
    (join just the nodes whose dist changed) drops in by filtering the
    relax input; omitted here to keep the oracle replayable row-for-row.
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
    prev = None
    for i in range(max_hops):
        relaxed = (
            edges.join(
                F.broadcast(dist.withColumnRenamed("node", "src")), "src"
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
    return dist


def label_propagation(
    edges: DataFrame, iters: int
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

    Returns ``(node, label)`` after ``iters`` rounds.

    100 TB shape per round: one edge-scan join carrying the node-sized
    label table (broadcast when it fits), one (dst, label) count
    aggregate, one deterministic arg-max via max_by over a (count,
    -label) struct — two shuffles on node-sized data, edge data never
    reshuffles (cached scan)."""
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
    labels = nodes.select("node", F.col("node").alias("label"))
    prev = None
    for _ in range(iters):
        counts = (
            edges.join(
                F.broadcast(labels.withColumnRenamed("node", "src")), "src"
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winner = counts.groupBy("node").agg(
            F.max_by(
                "label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
            ).alias("new_label")
        )
        labels = (
            labels.join(winner, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
        )
        # node-sized materialization per round truncates the lineage so
        # the next round's broadcast does not re-run this one
        labels = labels.cache()
        labels.count()
        if prev is not None:
            prev.unpersist()
        prev = labels
    return labels
