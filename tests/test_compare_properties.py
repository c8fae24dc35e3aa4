"""Property suite for tools/compare.py — the local gate's trust anchor
(r12, verdict r11 stretch #7).  The Hypothesis pattern found real bugs
in the partition-escape (r10) and regex-dialect (r11) seams while being
drafted; this block pins the comparator the same way: arbitrary typed
rows round-tripped through BOTH engines' collect shapes must normalize
identically, and the float tolerance must forgive exactly one
6-decimal rounding step and nothing wider, independent of row order."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tools.compare import LOG_ROUND_TOL, normalize, tolerant_rows_equal

# scalar values as they come out of a collect(): None, bool, int,
# float (inf/nan included — both engines yield the same VALUE; only
# container types differ), str, and binary
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.text(max_size=20),
    st.binary(max_size=16),
)


def _col_names(n):
    return st.lists(
        st.text(
            alphabet=st.sampled_from(list("abcdefxyz_")), min_size=1, max_size=8
        ),
        min_size=n,
        max_size=n,
        unique=True,
    )


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_normalize_engine_shape_and_column_order_invariant(data):
    """Spark's collect shape (bytearray binary, arbitrary column order)
    and DuckDB's (bytes blob, its own column order) must normalize to
    the SAME (values, columns) — the whole premise of the gate."""
    ncols = data.draw(st.integers(min_value=1, max_value=4))
    cols = data.draw(_col_names(ncols))
    rows = data.draw(
        st.lists(
            st.tuples(*[_scalars for _ in range(ncols)]), min_size=0, max_size=8
        )
    )
    # spark shape: binary arrives as bytearray
    spark_rows = [
        tuple(bytearray(v) if isinstance(v, bytes) else v for v in r)
        for r in rows
    ]
    # duck shape: same values, columns permuted (SELECT order differs)
    perm = data.draw(st.permutations(list(range(ncols))))
    duck_rows = [tuple(r[i] for i in perm) for r in rows]
    duck_cols = [cols[i] for i in perm]

    s_vals, s_cols = normalize(spark_rows, cols)
    d_vals, d_cols = normalize(duck_rows, duck_cols)
    assert s_cols == d_cols
    assert s_vals == d_vals
    assert tolerant_rows_equal(s_vals, d_vals)


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_normalize_canonicalizes_zero_and_row_order(data):
    """-0.0 vs 0.0 and input row order must not affect the normalized
    form (the driver hashes sorted rows)."""
    n = data.draw(st.integers(min_value=1, max_value=6))
    rows = data.draw(
        st.lists(st.tuples(_scalars), min_size=n, max_size=n)
    )
    shuffled = data.draw(st.permutations(rows))
    assert normalize(rows, ["v"]) == normalize(list(shuffled), ["v"])
    z, _ = normalize([(0.0,), (-0.0,)], ["v"])
    assert z[0] == z[1] == ("0",)


# well-separated grid values (>= 1e-3 apart, |v| < 10) so a <= 2e-6
# perturbation can never cross rows, and %.9g rendering keeps 1e-7
# resolution at this magnitude
_grid = st.lists(
    st.integers(min_value=-9999, max_value=9999), min_size=1, max_size=8,
    unique=True,
)


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_one_rounding_step_forgiven_any_row_order(data):
    """Per-value drift <= 1.4e-6 (one 6-decimal rounding step + render
    slack) compares equal even when the drift changes sort positions —
    the realignment fallback re-pairs, never widens."""
    ks = data.draw(_grid)
    deltas = [
        data.draw(st.floats(min_value=-1.4e-6, max_value=1.4e-6))
        for _ in ks
    ]
    a = sorted((f"{k / 1000:.9g}",) for k in ks)
    b = sorted((f"{k / 1000 + d:.9g}",) for k, d in zip(ks, deltas))
    assert tolerant_rows_equal(a, b)


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_two_rounding_steps_still_fail(data):
    """A genuine 2-step difference (>= 2.1e-6) on ANY single row fails,
    no matter how the rows are ordered — the band forgives exactly one
    libm flip, not real value drift."""
    ks = data.draw(_grid)
    idx = data.draw(st.integers(min_value=0, max_value=len(ks) - 1))
    sign = data.draw(st.sampled_from([-1.0, 1.0]))
    a = sorted((f"{k / 1000:.9g}",) for k in ks)
    b = sorted(
        (f"{k / 1000 + (sign * 2.1e-6 if i == idx else 0.0):.9g}",)
        for i, k in enumerate(ks)
    )
    assert not tolerant_rows_equal(a, b)
    assert LOG_ROUND_TOL < 2.1e-6


def test_requantize_key_numeric_bucket_is_engine_shaped_only():
    """ADVICE r13: Python's float() accepts forms no engine emits —
    '1_0' (→10.0), '  2  ', 'Infinity' — and keying those numerically
    would move text values into the numeric sort bucket.  The
    _NUMERICISH pre-filter keeps them lexicographic while genuine
    integer- and float-shaped renderings still key numerically."""
    from tools.compare import _requantize_key

    # exotic-but-parseable forms stay in the lexicographic bucket
    for exotic in ("1_0", "  2  ", "Infinity", "-inf", "nan", "0x1f",
                   "1.", ".5", "+3"):
        assert _requantize_key((exotic,))[0][0] == 1, exotic
    # engine-shaped renderings key numerically (integer-shaped included)
    for numeric in ("10", "-3", "2.5", "-1.4e-45", "1E6", "0"):
        tag, val, orig = _requantize_key((numeric,))[0]
        assert tag == 0 and val == float(f"{float(numeric):.5g}")
    # integer-shaped and float-shaped renderings of the same value
    # land on the same numeric key (the alignment property)
    assert _requantize_key(("2",))[0][:2] == _requantize_key(("2.0",))[0][:2]
