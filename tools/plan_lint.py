"""Global physical-plan lint: every catalog query, three hard rules.

tests/test_plan_shapes.py pins ~60 load-bearing shapes query-by-query;
this tool is the complement — a repo-WIDE sweep that builds every
registered query at sf0.001 and rejects the three plan nodes that are
never acceptable at 100 TB, no matter which query they appear in:

  1. ``CartesianProduct``        — an unconditioned all-pairs join
  2. ``BroadcastNestedLoopJoin`` — a non-equi join materializing one
     full side per task
  3. ``BatchEvalPython``         — a row-at-a-time Python UDF (the
     Arrow-batched nodes ArrowEvalPython / MapInPandas /
     FlatMapGroupsInPandas / MapInArrow are the sanctioned Python seam
     and are reported as info, not failure)

Rule 2 admits an explicit per-query whitelist: a bounded set of plans
join against a KNOWN-CONSTANT-sized broadcast side (a 1-row scalar
aggregate, a k-centroid grid, a config-sized registry) where the
nested-loop is over tens of rows by construction.  Every whitelist
entry carries the justification inline — an unexplained entry is a
review failure by policy.  Rule 1 admits no exceptions: a
CartesianProduct partitions BOTH sides, so nothing bounds it.

Writes PLANLINT.json at the repo root:
  {"summary": {...}, "queries": {name: {cartesian, bnlj, batch_eval,
   whitelisted, n_exchanges, python_nodes, ok, err}}}

Run from the repo root:  python tools/plan_lint.py  [sf_dir]
Exit status 1 if any query fails the lint.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from starryskyqueryengine_spark.session import get_spark  # noqa: E402

# query -> why a nested-loop / cartesian node is SAFE there (the joined
# side is constant-sized by construction, independent of data scale).
# Three families, all with a broadcast side whose row count is bounded
# by a PARAMETER of the query, never by the data:
#   scalar:  a keys=[] aggregate — exactly 1 row (corpus total, global
#            threshold) joined back as a broadcast filter instead of a
#            driver collect
#   grid:    a literal/constant relation — k centroids, the CM-sketch
#            row range, a config blocklist, the feed-condition registry,
#            the K query vectors
#   range:   a non-equi interval condition against a bounded side
WHITELIST: dict[str, str] = {
    "ann_cosine_topk": "grid: K query vectors (id<5) broadcast cross the base scan",
    "bigram_pmi_topk": "scalars: 1-row unigram-total and bigram-total aggregates broadcast into the PMI expr",
    "bm25_search": "scalar: 1-row (N, avgdl) corpus stats broadcast into the score",
    "contrastive_negatives": "scalar: 1-row n_docs count for the negative-offset arithmetic",
    "countmin_frequency": "grid: probe terms x Range(0, depth=4) sketch-row grid",
    "domain_blocklist_filter": "grid: config-sized blocklist; suffix match is inherently non-equi",
    "dsir_importance_weights": "scalar: 1-row target/raw total counts broadcast into the weight",
    "dsir_resample": "scalar: same 1-row totals as dsir_importance_weights",
    "hybrid_rrf_search": "scalar: BM25 leg's 1-row (N, avgdl) stats",
    "lm_perplexity_scores": "scalar: 1-row vocab-size aggregate broadcast into the smoothing denominator (optimization r14 — replaced a driver count())",
    "kmeans_update_step": "grid: k centroids broadcast for the assign step",
    "knn_centroid_assign": "grid: k centroids broadcast for the assign step",
    "mixture_sample": "scalar: 1-row grand-total token count joined into per-source rates",
    "multifeed_datadriven": "grid: feed-condition registry (config data) with RLIKE condition",
    "pipeline_pretrain_prep": "scalar: mixture stage's 1-row grand-total token count",
    "pipeline_rag_retrieval": "scalar: BM25 leg's 1-row (N, avgdl) stats",
    "q11_important_stock": "scalar: 1-row global value threshold broadcast, never collected",
    "q22_dormant_customers": "scalar: 1-row avg account balance broadcast, never collected",
    "quality_bucket_sample": "scalar: 1-row total-count for the cumulative-fraction cutoffs",
    "rolling_7d_active_users": "range: report-window day bounds (1 row) interval condition",
    "semantic_dedup": "grid: k centroids broadcast for the cell-assign step",
    "source_kl_divergence": "scalar+grid: 1-row corpus total x bounded |sources| side",
    "tfidf_top_terms": "scalar: 1-row corpus doc count broadcast into the IDF",
}

# Arrow-batched Python nodes: allowed, but surfaced so a new one showing
# up in a previously pure-JVM query is visible in the artifact diff.
_PY_NODES = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandasWithState",
    "PythonMapInArrow",
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint_one(name: str, plan: str) -> dict:
    rec = {
        "cartesian": "CartesianProduct" in plan,
        "bnlj": "BroadcastNestedLoopJoin" in plan,
        "batch_eval": "BatchEvalPython" in plan,
        "whitelisted": name in WHITELIST,
        "n_exchanges": len(re.findall(r"\bExchange (?:hash|range|Single)", plan)),
        "python_nodes": sorted({n for n in _PY_NODES if n in plan}),
        "err": None,
    }
    # the whitelist excuses a bounded-side BroadcastNestedLoopJoin only;
    # a CartesianProduct (both sides partitioned — nothing bounds it) is
    # never acceptable, whitelisted or not
    bnlj_ok = (not rec["bnlj"]) or rec["whitelisted"]
    rec["ok"] = bnlj_ok and not rec["cartesian"] and not rec["batch_eval"]
    return rec


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    queries = entrymod.queries()
    # whitelist staleness guard (the PRIORITY-window-integrity rule
    # applied here): an entry naming a renamed/deleted query would
    # silently pre-excuse a future BNLJ in whatever query later takes
    # the name — fail loudly instead
    stale = sorted(set(WHITELIST) - set(queries))
    if stale:
        raise SystemExit(f"plan_lint: WHITELIST names not registered: {stale}")
    out: dict[str, dict] = {}
    t0 = time.time()
    for i, (name, fn) in enumerate(queries.items()):
        try:
            plan = plan_of(fn(spark, sf_dir))
            out[name] = lint_one(name, plan)
        except Exception as e:  # build failure is a lint failure
            out[name] = {
                "cartesian": None,
                "bnlj": None,
                "batch_eval": None,
                "whitelisted": name in WHITELIST,
                "n_exchanges": None,
                "python_nodes": [],
                "err": f"{type(e).__name__}: {e}"[:300],
                "ok": False,
            }
        # caches registered by iterative builders (graph edge lists,
        # LSH bands) would otherwise accumulate across 196 builds and
        # substitute InMemoryRelation into LATER queries' linted plans
        spark.catalog.clearCache()
        if (i + 1) % 25 == 0:
            print(f"  [{i + 1}/{len(queries)}] {time.time() - t0:.0f}s", flush=True)
    bad = sorted(k for k, v in out.items() if not v["ok"])
    # a whitelisted query that no longer exhibits a BNLJ is a stale
    # excuse waiting to mask a regression — surface it in the artifact
    unused_whitelist = sorted(
        k for k in WHITELIST
        if k in out and out[k].get("bnlj") is False
    )
    summary = {
        "unused_whitelist": unused_whitelist,
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "n_ok": sum(v["ok"] for v in out.values()),
        "n_fail": len(bad),
        "failures": bad,
        "n_whitelisted": sum(v["whitelisted"] for v in out.values()),
        "elapsed_sec": round(time.time() - t0, 1),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANLINT.json"), "w") as f:
        json.dump({"summary": summary, "queries": out}, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
