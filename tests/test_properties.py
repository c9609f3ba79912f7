"""Property-based tests (hypothesis) for pure-Python kernels.

These guard invariant CLASSES rather than examples — motivated by the
round-3 hyperplane bug, where every example-level test passed while a
structural property (hash avalanche -> bucket spread) was silently
broken for every input. No Spark session: all targets are pure Python,
so hundreds of generated examples run in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from hgcn_name_disambiguation_spark.functions.text import porter_stem
from hgcn_name_disambiguation_spark.operators.dedup import _M64, _mix64
from hgcn_name_disambiguation_spark.operators.similarity import _hyperplanes


@given(st.integers(min_value=0, max_value=_M64))
def test_mix64_range_and_determinism(x):
    y = _mix64(x)
    assert 0 <= y <= _M64
    assert _mix64(x) == y


@settings(max_examples=300)
@given(
    st.integers(min_value=0, max_value=_M64),
    st.integers(min_value=0, max_value=63),
)
def test_mix64_single_bit_avalanche(x, bit):
    """Flipping ONE input bit must flip many output bits. The broken
    round-1/2 generator was linear in its inputs (zero avalanche),
    which collapsed every LSH bucket; splitmix64's finalizer gives
    ~32 flipped bits on average — 12 is a safe floor for any input."""
    y1 = _mix64(x)
    y2 = _mix64(x ^ (1 << bit))
    assert bin(y1 ^ y2).count("1") >= 12


@settings(max_examples=100)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=16, max_value=128),
)
def test_hyperplane_never_near_constant(seed, table, dim):
    """For ANY (seed, table, dim >= 16 — realistic embedding dims), no
    generated plane may be a near-constant vector (the degenerate form
    that reduced every sign bit to sign(sum(v))). Spread =
    max|c - mean| must be a large fraction of the [-1, 1] range; with
    >= 16 independent uniform components the bound holds except with
    probability ~0.3^15 per plane."""
    planes = _hyperplanes(1, 4, dim, seed)[0]
    for plane in planes:
        mean = sum(plane) / len(plane)
        spread = max(abs(c - mean) for c in plane)
        assert spread > 0.3, f"near-constant plane (spread={spread:.4f})"


@settings(max_examples=300)
@given(st.text(max_size=40))
def test_porter_stem_total_and_deterministic(w):
    """The stemmer is applied to arbitrary tokenizer output at corpus
    scale — it must be total (never raise) and deterministic. NOTE:
    Porter is NOT idempotent (measured: 533 of 11k corpus vocabulary
    words stem differently on a second pass, e.g. 'courses' -> 'cours'
    -> 'cour'), so idempotence is deliberately not asserted."""
    s = porter_stem(w)
    assert isinstance(s, str)
    assert porter_stem(w) == s


@settings(max_examples=300)
@given(st.from_regex(r"[a-z]{1,30}", fullmatch=True))
def test_porter_stem_stays_lowercase_alpha(w):
    s = porter_stem(w)
    assert s == "" or s.isascii()
    assert all("a" <= c <= "z" for c in s)
    # suffix stripping may rewrite (e.g. 'at' -> 'ate') but never grows
    # a word by more than one character
    assert len(s) <= len(w) + 1
