"""Shared oracle-comparison helpers for the local correctness gates.

``tolerant_rows_equal`` accepts a 1-ulp-at-6-decimals band on float
values: queries whose outputs pass through ``ROUND(ln(...), 6)``
(BM25 / DSIR / KL) compare a JVM ``Math.log`` against DuckDB's libm —
the raw doubles can differ by 1 ulp, and when such a value sits within
an ulp of a 0.5e-6 rounding boundary the 6th decimal flips on one side
only.  That flip is a 1e-6 step in the rounded value; a band of 1.5e-6
forgives exactly that and nothing wider (a genuine 2-step difference of
2e-6 still fails).  Non-float values stay strict.
"""

from __future__ import annotations

# one rounding-step flip at 6 decimals is 1e-6; 1.5e-6 accepts it and
# rejects anything two steps apart
LOG_ROUND_TOL = 1.5e-6


def _vals_equal(a: str, b: str, tol: float = LOG_ROUND_TOL) -> bool:
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return False
    if fa != fa or fb != fb:  # NaN: only equal if both (a == b above)
        return False
    return abs(fa - fb) <= tol


def tolerant_rows_equal(s_vals, d_vals, tol: float = LOG_ROUND_TOL) -> bool:
    """Pairwise compare two SORTED lists of normalized row tuples,
    forgiving float differences within ``tol``.  Falls back to strict
    equality first (the overwhelmingly common case costs one list
    compare)."""
    if s_vals == d_vals:
        return True
    if len(s_vals) != len(d_vals):
        return False
    for ra, rb in zip(s_vals, d_vals):
        if ra == rb:
            continue
        if len(ra) != len(rb):
            return False
        if not all(_vals_equal(a, b, tol) for a, b in zip(ra, rb)):
            return False
    return True
