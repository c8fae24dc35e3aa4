"""Shared oracle-comparison helpers for the local correctness gates —
the ONE implementation of normalize / type-drift / tolerant compare,
imported by both tools/full_gate.py and tests/test_oracle_parity.py so
the standalone gate and the pytest gate can never drift apart.

``tolerant_rows_equal`` accepts a 1-ulp-at-6-decimals band on float
values: queries whose outputs pass through ``ROUND(ln(...), 6)``
(BM25 / DSIR / KL) compare a JVM ``Math.log`` against DuckDB's libm —
the raw doubles can differ by 1 ulp, and when such a value sits within
an ulp of a 0.5e-6 rounding boundary the 6th decimal flips on one side
only.  That flip is a 1e-6 step in the rounded value; a band of 1.5e-6
forgives exactly that and nothing wider (a genuine 2-step difference of
2e-6 still fails).  Non-float values stay strict; the tolerance is
further gated to FLOAT-SHAPED strings so numeric text inside a string
column never silently earns it.
"""

from __future__ import annotations

import math
import re

# one rounding-step flip at 6 decimals is 1e-6; 1.5e-6 accepts it and
# rejects anything two steps apart
LOG_ROUND_TOL = 1.5e-6

# the tolerance applies only to values that LOOK like floats — an
# integer-shaped or arbitrary string that merely parses as float (a
# VARCHAR column carrying numeric text) stays strict, matching the
# driver's exact string hash as closely as type-erased values allow
_FLOATISH = re.compile(r"-?\d+\.\d+([eE][+-]?\d+)?|-?\d+[eE][+-]?\d+")
# engine-emittable numeric renderings: _FLOATISH plus integer-shaped.
# Gate for the sort key only — Python's float() accepts forms no engine
# emits ('1_0' → 10.0, '  2  ', 'Infinity'), and keying those
# numerically would silently move text values into the numeric bucket
# (ADVICE r13).
_NUMERICISH = re.compile(r"-?\d+(\.\d+)?([eE][+-]?\d+)?")


def normalize(rows, columns):
    """Sort columns by name, then rows; stringify floats to 9 sig digits
    (the driver-compatible canonical form)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if v == 0:
                v = 0.0  # canonical signed zero: '-0' vs '0' would fail
                # the strict compare, and neither is float-shaped enough
                # for the tolerance gate
            return f"{v:.9g}"
        if isinstance(v, (bytes, bytearray)):
            # Spark collect() yields bytearray for BinaryType, DuckDB
            # yields bytes for BLOB — their str() forms differ
            # ("bytearray(b'x')" vs "b'x'"), so a binary output column
            # would fail spuriously.  Canonical hex for both.
            return "0x" + bytes(v).hex()
        return str(v)

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out), [columns[i] for i in order]


# DuckDB DESCRIBE type -> Spark dtype, for the type-drift guard: the
# driver's value hash is TYPE-SENSITIVE, so an oracle producing HUGEINT
# (count arithmetic) or DECIMAL (sum over decimal) where Spark yields
# bigint/double would pass a stringified compare locally and fail the
# driver — those types are FORBIDDEN in oracle output columns.
_DUCK_TO_SPARK = {
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BLOB": "binary",
}


def duck_type_to_spark(t: str) -> str:
    t = t.strip()
    if t.endswith("[]"):
        return f"array<{duck_type_to_spark(t[:-2])}>"
    if t == "HUGEINT" or t.startswith("DECIMAL") or t.startswith("UHUGEINT"):
        return f"FORBIDDEN({t})"
    return _DUCK_TO_SPARK.get(t, t.lower())


def type_drift(duck_described, spark_dtypes) -> dict:
    """{column: (duck, spark)} for every mismatched/forbidden column;
    empty when the oracle's types match Spark's exactly."""
    duck_types = {r[0]: duck_type_to_spark(r[1]) for r in duck_described}
    spark_types = dict(spark_dtypes)
    if set(duck_types) != set(spark_types):
        return {
            "__columns__": (sorted(duck_types), sorted(spark_types))
        }
    return {
        c: (duck_types[c], spark_types[c])
        for c in duck_types
        if duck_types[c] != spark_types[c]
    }


def _vals_equal(a: str, b: str, tol: float = LOG_ROUND_TOL) -> bool:
    if a == b:
        return True
    # at least ONE side must be float-shaped: %.9g renders 2.0 as "2",
    # so a 6-dp value at an integer boundary pairs an integer-shaped
    # string with a float-shaped one; two integer-shaped strings (or
    # arbitrary text) stay strict — a pair of genuine integers within
    # 1.5e-6 of each other is equal anyway
    if not (_FLOATISH.fullmatch(a) or _FLOATISH.fullmatch(b)):
        return False
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return False
    if fa != fa or fb != fb:  # NaN: only equal if both (a == b above)
        return False
    return abs(fa - fb) <= tol


def _requantize_key(row):
    """Sort key with numeric values re-rounded to 5 significant digits:
    two engines' 6-dp values that differ by one rounding step collapse
    onto the same key, so rows whose sub-tolerance flip changed their
    SORT POSITION realign.  The key is NUMERIC-aware (r12 — the
    property suite's first run found the gap): lexicographic order of
    float renderings disagrees with numeric order across signs and
    exponents ('-1.4e-45' sorts before '-1.402' as a string, after it
    as a number; '0' pairs with a float-shaped near-zero), so numeric
    strings key as (0, rounded value, original) and everything else as
    (1, original) — finite floats sort numerically, the rest
    lexicographically, and the buckets never interleave.  The key is
    for ALIGNMENT only — the comparison still runs on the original
    values under the strict tolerance, so a genuine 2-step difference
    keeps failing."""
    def q(v: str):
        # _NUMERICISH pre-filter: only engine-shaped numeric strings
        # enter the numeric bucket; exotic float()-parseable forms
        # ('1_0', '  2  ', 'Infinity') stay lexicographic.  nan/inf
        # renderings fail the regex, so the isfinite concern is covered
        # by the same gate.
        if not isinstance(v, str) or not _NUMERICISH.fullmatch(v):
            return (1, v)
        return (0, float(f"{float(v):.5g}"), v)

    return tuple(q(v) for v in row)


def _rows_equal_positional(s_vals, d_vals, tol: float) -> bool:
    return all(
        ra == rb
        or (
            len(ra) == len(rb)
            and all(_vals_equal(a, b, tol) for a, b in zip(ra, rb))
        )
        for ra, rb in zip(s_vals, d_vals)
    )


def tolerant_rows_equal(s_vals, d_vals, tol: float = LOG_ROUND_TOL) -> bool:
    """Pairwise compare two SORTED lists of normalized row tuples,
    forgiving float differences within ``tol``.  Strict equality first
    (the overwhelmingly common case costs one list compare); then the
    positional tolerant pass; then — because a sub-tolerance flip can
    change a row's sort position and misalign the zip — one retry with
    both sides RE-SORTED by a requantized alignment key, still compared
    value-by-value under the same strict tolerance.  The fallback only
    re-pairs rows; it never widens what counts as equal."""
    if s_vals == d_vals:
        return True
    if len(s_vals) != len(d_vals):
        return False
    if _rows_equal_positional(s_vals, d_vals, tol):
        return True
    s_re = sorted(s_vals, key=_requantize_key)
    d_re = sorted(d_vals, key=_requantize_key)
    return _rows_equal_positional(s_re, d_re, tol)
