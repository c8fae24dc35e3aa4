"""Property suite for operators/asof.py (target #10 of the Hypothesis
cadence): the union + carry-forward-window composition must agree with a
per-row brute-force oracle — for every left row, the right row with the
LARGEST ts <= left.ts on the same non-NULL key, ties broken by the
largest tiebreak — under arbitrary key collisions, NULL keys, NULL
timestamps, NULL payload values, and exact-tie timestamps on both sides.

The r13 review found a real divergence here (NULL-key right payloads
carried onto NULL-key left rows, where JOIN semantics — and the DuckDB
ASOF oracle — match nothing on NULL); this suite pins the whole
semantics surface, not just that case."""

from hypothesis import given, settings
from hypothesis import strategies as st

from starryskyqueryengine_spark.operators.asof import as_of_join

_key = st.sampled_from([None, "a", "b"])
_ts = st.one_of(st.none(), st.integers(0, 8))
_pay = st.one_of(st.none(), st.integers(0, 99))

_left_rows = st.lists(st.tuples(_key, _ts), max_size=12)
_right_rows = st.lists(st.tuples(_key, _ts, _pay), max_size=12)


def _oracle(lk, lts, right):
    """Brute force: (payload, tb) of the winning right row, else NULLs.
    right: list of (k, ts, payload, tb) with tb unique per row."""
    if lk is None or lts is None:
        return (None, None)
    cands = [
        (rts, tb, pay)
        for (rk, rts, pay, tb) in right
        if rk == lk and rts is not None and rts <= lts
    ]
    if not cands:
        return (None, None)
    rts, tb, pay = max(cands, key=lambda c: (c[0], c[1]))
    return (pay, tb)


def _run(spark, left, right, tiebreak):
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "lid long, k string, ts long",
    )
    rdf = spark.createDataFrame(right, "k string, ts long, payload long, tb long")
    out = as_of_join(
        ldf, rdf, key_col="k", ts_col="ts",
        right_payload=["payload", "tb"], tiebreak_col=tiebreak,
    )
    got = {r["lid"]: (r["asof_payload"], r["asof_tb"]) for r in out.collect()}
    want = {i: _oracle(k, ts, right) for i, (k, ts) in enumerate(left)}
    assert got == want, {"got": got, "want": want, "left": left, "right": right}


@settings(max_examples=25, deadline=None)
@given(left=_left_rows, right=_right_rows)
def test_asof_matches_brute_force_with_tiebreak(spark, left, right):
    # unique tb per right row keeps the winner well-defined even when
    # several right rows share (key, ts) — the documented tiebreak path
    right = [(k, ts, pay, i) for i, (k, ts, pay) in enumerate(right)]
    _run(spark, left, right, tiebreak="tb")


@settings(max_examples=25, deadline=None)
@given(left=_left_rows, right=_right_rows)
def test_asof_matches_brute_force_unique_key_ts(spark, left, right):
    # the no-tiebreak contract requires right deterministic per
    # (key, ts): keep the first row of each (key, ts) group
    seen, uniq = set(), []
    for (k, ts, pay) in right:
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        uniq.append((k, ts, pay, len(uniq)))
    _run(spark, left, uniq, tiebreak=None)
