"""Property suite for operators/bloom.py (target #11): the split
invariant — definitely_new ∪ exact-join(maybe_dup) == plain anti-join,
and definitely_new never contains a stored key (no false negatives) —
must hold for ANY key distribution and ANY filter sizing, including an
adversarially undersized filter (expected_items=1 against dozens of
stored keys drives the real fpp toward 1; correctness must not care)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from starryskyqueryengine_spark.operators.bloom import bloom_split_new

# small alphabet forces genuine stored/incoming overlap; NULLs and
# non-ASCII ride along
_key = st.sampled_from([None, "a", "b", "c", "ü", "at://d/e/f", ""])
_keys = st.lists(_key, max_size=10)


@settings(max_examples=15, deadline=None)
@given(
    stored_keys=_keys,
    incoming_keys=_keys,
    fpp=st.sampled_from([0.5, 0.01]),
    expected=st.sampled_from([None, 1]),
)
def test_bloom_split_equals_plain_anti_join(
    spark, stored_keys, incoming_keys, fpp, expected
):
    stored = spark.createDataFrame(
        [(k,) for k in stored_keys], "uri string"
    )
    incoming = spark.createDataFrame(
        [(k, i) for i, k in enumerate(incoming_keys)], "uri string, rid long"
    )
    definitely_new, maybe_dup = bloom_split_new(
        incoming, stored, key_col="uri", expected_items=expected, fpp=fpp
    )
    dn = [(r["uri"], r["rid"]) for r in definitely_new.collect()]
    md = [(r["uri"], r["rid"]) for r in maybe_dup.collect()]

    # the two halves partition the batch exactly
    assert sorted(dn + md, key=str) == sorted(
        [(k, i) for i, k in enumerate(incoming_keys)], key=str
    )

    # no false negatives: a definitely-new row's key is absent from
    # stored (NULL keys are never "stored" under join semantics)
    stored_set = {k for k in stored_keys if k is not None}
    assert not [r for r in dn if r[0] in stored_set], (dn, stored_keys)

    # split-then-exact == plain exact, row for row
    exact = [
        (r["uri"], r["rid"])
        for r in maybe_dup.join(stored, "uri", "left_anti").collect()
    ]
    plain = [
        (r["uri"], r["rid"])
        for r in incoming.join(stored, "uri", "left_anti").collect()
    ]
    assert sorted(dn + exact, key=str) == sorted(plain, key=str)
