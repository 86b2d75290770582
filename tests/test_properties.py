"""Property-based tests (hypothesis) for the pure planner-side helpers.

These run driver-side with no JVM — they pin the request-surface
invariants the compilers rely on: sanitized field names are always
legal, pagination tokens round-trip, the metadataQuery grammar parses
what it prints.
"""

from __future__ import annotations

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from visual_asset_management_system_spark.functions.normalize import (
    sanitize_field_name,
)
from visual_asset_management_system_spark.plans.metadata_query import (
    MetadataQueryError,
    _parse,
)
from visual_asset_management_system_spark.plans.pagination import (
    decode_page_token,
    encode_page_token,
)

_LEGAL = re.compile(r"^[a-z0-9_-]*$")


@given(st.text(max_size=300))
@settings(max_examples=200)
def test_sanitize_field_name_always_legal(name):
    s = sanitize_field_name(name)
    assert _LEGAL.fullmatch(s), s
    assert len(s) <= 255
    assert s  # never empty
    assert not s[0].isdigit()
    assert not s.startswith("_")


@given(st.text(alphabet=string.ascii_lowercase + "_-", min_size=1, max_size=50))
@settings(max_examples=200)
def test_sanitize_field_name_idempotent(name):
    once = sanitize_field_name(name)
    assert sanitize_field_name(once) == once


@given(
    st.dictionaries(
        st.text(alphabet=string.ascii_letters + string.digits + "_", min_size=1, max_size=20),
        st.one_of(
            st.text(max_size=50),
            st.integers(min_value=-(2**53), max_value=2**53),
            st.floats(allow_nan=False, allow_infinity=False),
            st.booleans(),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=200)
def test_page_token_roundtrip(last_key):
    assert decode_page_token(encode_page_token(last_key)) == last_key


_KEY = st.text(
    alphabet=string.ascii_lowercase + string.digits + "_", min_size=1, max_size=15
)
# unquoted values must not contain whitespace/quotes/colons per the grammar
_VALUE = st.text(
    alphabet=string.ascii_lowercase + string.digits + "_*?.-", min_size=1, max_size=15
)


@given(
    st.lists(st.tuples(_KEY, _VALUE, st.booleans()), min_size=1, max_size=5),
    st.sampled_from(["AND", "OR"]),
)
@settings(max_examples=200)
def test_metadata_query_parser_roundtrip(pairs, op):
    parts = [(f'{k}:"{v}"' if exact else f"{k}:{v}") for k, v, exact in pairs]
    query = f" {op} ".join(parts)
    parsed_op, parsed = _parse(query)
    if len(pairs) > 1:
        assert parsed_op == op
    assert [(k, v) for k, v, _ in parsed] == [(k, v) for k, v, _ in pairs]
    # exactness survives for quoted values
    assert [e for _, _, e in parsed] == [e for _, _, e in pairs]


def test_metadata_query_rejects_mixed_operators():
    import pytest

    with pytest.raises(MetadataQueryError):
        _parse("a:1 AND b:2 OR c:3")


# -- PII pattern set ---------------------------------------------------------

def _py_redact(text: str) -> str:
    """Pure-Python model of operators/pii.redact — same patterns, same
    order (cross-engine value parity is oracle-tested; this pins a
    design property of the pattern set itself)."""
    from visual_asset_management_system_spark.operators.pii import PII_PATTERNS

    for kind, pat in PII_PATTERNS.items():
        text = re.sub(pat, f"[{kind.upper()}]", text)
    return text


_pii_alphabet = st.sampled_from(
    list(string.ascii_letters + string.digits + " .-@%+_[]()") 
)


@given(st.text(alphabet=_pii_alphabet, max_size=120))
@settings(max_examples=300)
def test_pii_redaction_idempotent(text):
    """One redaction pass reaches a fixed point: replacement tokens and
    surviving text never combine into a NEW match for any pattern (an
    ordering bug between patterns would break this)."""
    once = _py_redact(text)
    assert _py_redact(once) == once


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=100)
def test_pii_planted_forms_always_detected(n):
    """The id-derived planted forms used by q_doc_pii match for every
    conceivable id."""
    from visual_asset_management_system_spark.operators.pii import PII_PATTERNS

    assert re.search(PII_PATTERNS["email"], f"user{n}@example.com")
    assert re.search(PII_PATTERNS["phone"], f"call 415-555-{n % 10000:04d} ")
    assert re.search(PII_PATTERNS["ssn"], "ssn 123-45-6789 x")
    assert re.search(PII_PATTERNS["ipv4"], f"from 10.0.{n % 256}.{n % 200} ")


# ---------------------------------------------------------------------------
# round 9: sketch/setsim math (pure models of operators/sketches.py and
# operators/dedup.py setsim_join — the theorems the Spark plans rely on)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=30),
        min_size=2,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=16),
)
@settings(max_examples=200)
def test_kmv_merge_is_a_semilattice_model(segments, k):
    """Model form of the KMV store's core claim: merging per-segment
    k-minima (idempotently, in any order, with replays) equals the
    k-minima of the union — so at-least-once replay needs no dedup
    tags."""
    import hashlib

    def h(x):
        return int(hashlib.md5(f"{x}|kmv".encode()).hexdigest()[:8], 16)

    def sketch(keys):
        return sorted({h(x) for x in keys})[:k]

    merged: list[int] = []
    for seg in segments + segments[:1]:  # replay the first segment
        merged = sorted(set(merged) | set(sketch(seg)))[:k]
    union = set().union(*segments)
    assert merged == sketch(union)


@given(
    st.sets(st.integers(min_value=0, max_value=80), min_size=1, max_size=40),
    st.sets(st.integers(min_value=0, max_value=80), min_size=1, max_size=40),
    st.fractions(min_value="1/100", max_value="1", max_denominator=100),
    st.randoms(use_true_random=False),
)
@settings(max_examples=300)
def test_prefix_filter_is_lossless_model(x, y, tau, rnd):
    """The theorem setsim_join's candidate generation rests on: under
    ANY global total order, if J(x,y) ≥ τ then x and y share an element
    within each one's first |s| − ⌈τ·|s|⌉ + 1 elements — with ⌈·⌉ in
    integer arithmetic, exactly as the operator computes it."""
    inter = len(x & y)
    union = len(x | y)
    from fractions import Fraction

    if Fraction(inter, union) < tau:
        return  # theorem only claims qualifying pairs
    order = list(x | y)
    rnd.shuffle(order)
    rank = {v: i for i, v in enumerate(order)}

    def prefix(s):
        n = len(s)
        need = -((-tau.numerator * n) // tau.denominator)  # ⌈τ·n⌉ exact
        return set(sorted(s, key=rank.get)[: n - need + 1])

    assert prefix(x) & prefix(y), (sorted(x), sorted(y), str(tau))


@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=4, max_value=64),
)
@settings(max_examples=150)
def test_cms_never_underestimates_model(keys, depth, width):
    """Count-min's one-sided guarantee at the model level, with the
    operator's exact hash construction (md5(key|cms<d>) % width)."""
    import hashlib
    from collections import Counter

    def cell(key, d):
        return (
            int(
                hashlib.md5(f"{key}|cms{d}".encode()).hexdigest()[:8], 16
            )
            % width
        )

    grid = Counter()
    for key in keys:
        for d in range(depth):
            grid[(d, cell(key, d))] += 1
    truth = Counter(keys)
    for key, true_cnt in truth.items():
        est = min(grid[(d, cell(key, d))] for d in range(depth))
        assert est >= true_cnt


@given(
    st.lists(
        st.sets(st.text(string.ascii_lowercase, min_size=1, max_size=6),
                min_size=0, max_size=30),
        min_size=1, max_size=5,
    ),
    st.integers(min_value=2, max_value=4),
    st.integers(min_value=8, max_value=512),
)
@settings(max_examples=150)
def test_bloom_never_false_negative_and_or_merge_model(segments, depth, m):
    """Bloom's two load-bearing properties at the model level, with the
    operator's exact hash construction (md5(key|bloom<i>) % m): every
    inserted key probes present against the OR-merge of per-segment
    filters (zero false negatives under any segmentation/replay — bit
    sets form a semilattice under union), and the merged bit set equals
    the filter of the union."""
    import hashlib

    def bits(key):
        return {
            int(hashlib.md5(f"{key}|bloom{i}".encode()).hexdigest()[:8], 16)
            % m
            for i in range(depth)
        }

    def build(keys):
        out: set[int] = set()
        for k in keys:
            out |= bits(k)
        return out

    merged: set[int] = set()
    for seg in segments + segments[:1]:  # replay the first segment
        merged |= build(seg)
    union = set().union(*segments)
    assert merged == build(union)
    for key in union:
        assert bits(key) <= merged, key
