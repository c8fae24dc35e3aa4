"""Property suite for the auth 401 contract (r12).  Two real bugs in
this class escaped targeted tests before being found by review — a NaN
`exp` verified as never-expiring (r10) and a 400-digit integer `exp`
OverflowError'd past the AuthRequiredError contract into a 500 (r11).
The contract, pinned by fuzzing instead of one case at a time: for ANY
attacker-supplied header or token, `validate_auth`/`verify_jwt` either
returns a correctly verified `iss` or raises AuthRequiredError — no
other exception ever escapes, and no mutation of a valid token changes
the verified identity."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from starryskyqueryengine_spark.auth import (
    AuthRequiredError,
    sign_jwt_hs256,
    validate_auth,
    verify_jwt,
)

ISS = "did:example:alice"
SERVICE = "did:web:feed.example"
KEYS = {ISS: b"topsecret"}


def _lookup(did):
    return KEYS.get(did)

_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**420), max_value=10**420),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.text(max_size=12),
)
_json_vals = st.recursive(
    _json_scalars,
    lambda c: st.one_of(
        st.lists(c, max_size=3),
        st.dictionaries(st.text(max_size=6), c, max_size=3),
    ),
    max_leaves=8,
)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80))
def test_arbitrary_authorization_header_stays_in_contract(header):
    """Any header string: verified iss or AuthRequiredError, nothing else."""
    try:
        got = validate_auth({"Authorization": header}, SERVICE, _lookup)
    except AuthRequiredError:
        return
    # success is only reachable with a validly signed token, which an
    # arbitrary string cannot be
    raise AssertionError(f"arbitrary header verified as {got!r}")


@settings(max_examples=300, deadline=None)
@given(
    payload=st.dictionaries(
        st.sampled_from(["iss", "aud", "exp", "iat", "junk"]),
        _json_vals,
        max_size=5,
    ),
    real_iss=st.booleans(),
    real_aud=st.booleans(),
)
def test_arbitrary_signed_claims_stay_in_contract(payload, real_iss, real_aud):
    """A CORRECTLY SIGNED token with arbitrary claim types (huge ints,
    NaN/inf exp, nested garbage, wrong-typed iss/aud) must verify or
    401 — it must never crash, and it must never verify unless the
    claims actually pass the checks.  iss/aud are pinned to the real
    values on a subset of draws so the key-lookup / exp / signature
    paths are reached, not just the early claim checks."""
    if real_iss:
        payload = {**payload, "iss": ISS}
    if real_aud:
        payload = {**payload, "aud": SERVICE}
    token = sign_jwt_hs256(payload, KEYS[ISS])
    try:
        got = verify_jwt(token, SERVICE, _lookup)
    except AuthRequiredError:
        return
    # on success the checks must genuinely have held
    assert got == payload.get("iss") == ISS
    assert payload.get("aud") == SERVICE


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_single_char_mutation_never_changes_identity(data):
    """Flip one character anywhere in a valid token: the result either
    still verifies as the SAME iss (base64 tail bits that do not reach
    the decoded bytes) or raises AuthRequiredError.  It must never
    verify as anyone else and never escape the contract."""
    payload = {"iss": ISS, "aud": SERVICE, "exp": 2**35}
    token = sign_jwt_hs256(payload, KEYS[ISS])
    pos = data.draw(st.integers(min_value=0, max_value=len(token) - 1))
    repl = data.draw(
        st.sampled_from(list("AZaz09-_.=!{}\"")).filter(
            lambda c: c != token[pos]
        )
    )
    mutated = token[:pos] + repl + token[pos + 1 :]
    try:
        got = verify_jwt(mutated, SERVICE, _lookup)
    except AuthRequiredError:
        return
    assert got == ISS


def test_contract_suite_is_wired_to_real_checks():
    """Non-vacuity: the happy path does verify, and each guarded claim
    individually 401s."""
    good = {"iss": ISS, "aud": SERVICE, "exp": 2**35}
    assert verify_jwt(sign_jwt_hs256(good, KEYS[ISS]), SERVICE, _lookup) == ISS
    for bad in (
        {**good, "aud": "did:web:other"},
        {**good, "exp": 1},
        {**good, "iss": "did:example:mallory"},
        {k: v for k, v in good.items() if k != "iss"},
    ):
        try:
            verify_jwt(sign_jwt_hs256(bad, KEYS[ISS]), SERVICE, _lookup)
        except AuthRequiredError:
            continue
        raise AssertionError(f"{bad} should not verify")
