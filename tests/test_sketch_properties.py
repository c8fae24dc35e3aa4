"""Hypothesis property suite for the Misra-Gries fold (r13 — 8th target
of the property-suite pattern).  The two-pass exact heavy-hitters plan
is only exact if pass 1's candidate set is a guaranteed SUPERSET: for
any weighted stream folded in any batch split, every item with total
weight > W/k must survive the final summary, and every surviving
estimate must underestimate by at most W/(k+1) per the mergeable-
summaries bound.  Pure-Python target — no SparkSession."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from starryskyqueryengine_spark.functions.sketches import mg_fold


@settings(max_examples=300, deadline=None)
@given(
    stream=st.lists(
        st.tuples(st.integers(0, 9), st.integers(1, 50)),
        min_size=1, max_size=60,
    ),
    k=st.integers(1, 8),
    data=st.data(),
)
def test_mg_fold_superset_and_underestimate_bounds(stream, k, data):
    # split the stream into arbitrary contiguous batches
    cuts = sorted(
        data.draw(
            st.lists(st.integers(0, len(stream)), max_size=5)
        )
    )
    batches, prev = [], 0
    for c in cuts + [len(stream)]:
        if c > prev:
            batches.append(stream[prev:c])
            prev = c

    true = Counter()
    for t, w in stream:
        true[t] += w
    total = sum(true.values())

    counters: dict = {}
    for batch in batches:
        weights = Counter()
        for t, w in batch:
            weights[t] += w
        counters = mg_fold(counters, weights, k)

    # capacity: never more than k counters after a fold
    assert len(counters) <= k
    # superset guarantee: every item with weight > W/k survives
    for t, w in true.items():
        if w > total / k:
            assert t in counters, (t, w, total, k, counters)
    # estimates never exceed truth, and underestimate by <= W - sum of
    # all subtracted mass; per-item the classic bound is W/(k+1) per
    # the mergeable-summaries argument — but cumulative truncations
    # compose, so pin the provable aggregate form: est <= true and
    # true - est <= total/(k+1) * (number of folds is absorbed: each
    # subtracted d is backed by k+1 counters, so sum(d) <= W/(k+1))
    subtracted_bound = total / (k + 1)
    for t, est in counters.items():
        assert 0 < est <= true[t]
        assert true[t] - est <= subtracted_bound + 1e-9
