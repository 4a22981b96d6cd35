"""Hypothesis fuzz for the round-11 session-3 pure-algorithm kernels —
the algebra the EXACT oracles rely on, swept over adversarial inputs the
fixtures never produce (empty groups, all-ties, single elements,
negative sums). No SparkSession needed: these pin the PYTHON reference
implementations the pytest recompute-pins share with the operators, so a
kernel bug can't hide behind a fixture that happens to avoid it."""

from __future__ import annotations

import pytest

import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st



# Fuzz lane (VERDICT r14 #4): randomized/property spec — excluded from
# the default pytest lane (see pytest.ini); run via -m fuzz.
pytestmark = pytest.mark.fuzz

def _stack_pav(buckets):
    stack = []
    for cnt, pos in buckets:
        stack.append([pos, cnt, 1])
        while len(stack) > 1 and Fraction(stack[-2][0], stack[-2][1]) >= Fraction(
            stack[-1][0], stack[-1][1]
        ):
            p, c, w = stack.pop()
            stack[-1][0] += p
            stack[-1][1] += c
            stack[-1][2] += w
    out = []
    for p, c, w in stack:
        out.extend([Fraction(p, c)] * w)
    return out


def _minimax_pav(buckets):
    """The operators' integer minimax formulation (floored means)."""
    n = len(buckets)
    pre_p = [0]
    pre_c = [0]
    for c, p in buckets:
        pre_p.append(pre_p[-1] + p)
        pre_c.append(pre_c[-1] + c)

    def mean6(j, k):
        return (pre_p[k + 1] - pre_p[j]) * 1_000_000 // (pre_c[k + 1] - pre_c[j])

    out = []
    for b in range(n):
        out.append(
            max(min(mean6(j, k) for k in range(b, n)) for j in range(b + 1))
        )
    return out


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 50)).map(
            lambda t: (t[0], min(t[1], t[0]))
        ),
        min_size=1,
        max_size=12,
    )
)
def test_pav_minimax_equals_stack_pav(buckets):
    """floor(1e6·x) commutes with min/max, so the integer minimax must
    equal the floored exact stack-PAV on EVERY input, not just the
    fixture."""
    want = [math.floor(f * 1_000_000) for f in _stack_pav(buckets)]
    got = _minimax_pav(buckets)
    assert got == want
    assert got == sorted(got)  # isotonic by construction


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=40),
    st.integers(1, 8),
)
def test_hamilton_apportionment_invariants(counts, seats_scale):
    """Largest-remainder apportionment: exact budget, quota monotone
    bounds (each party gets floor or ceil of its exact quota)."""
    counts = [abs(c) + 1 for c in counts]
    seats = seats_scale * len(counts)
    total = sum(counts)
    quota = {i: (c * seats // total, (c * seats) % total) for i, c in enumerate(counts)}
    leftover = seats - sum(b for b, _ in quota.values())
    bonus = {
        i
        for i, _ in sorted(quota.items(), key=lambda kv: (-kv[1][1], kv[0]))[
            :leftover
        ]
    }
    alloc = {i: b + (1 if i in bonus else 0) for i, (b, _) in quota.items()}
    assert sum(alloc.values()) == seats
    for i, c in enumerate(counts):
        lo = c * seats // total
        assert alloc[i] in (lo, lo + 1)


def _lower_median(v):
    s = sorted(v)
    return s[(len(s) + 1) // 2 - 1]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=60))
def test_huber_irls_stays_in_hull_and_converges_on_ties(vs):
    """The integer IRLS kernel: the estimate never leaves [min, max],
    and a constant series fixes at that constant (k = 0 degeneracy)."""
    med = _lower_median(vs)
    mad = _lower_median([abs(x - med) for x in vs])
    k6 = (mad * 1345) // 1000
    mu = med
    for _ in range(4):
        num = den = 0
        for v in vs:
            r = abs(v - mu)
            w3 = 1000 if r <= k6 else (k6 * 1000) // r
            num += w3 * v
            den += w3
        assert den > 0  # the median row always carries weight
        mu = num // den
    assert min(vs) <= mu <= max(vs)
    if len(set(vs)) == 1:
        assert mu == vs[0]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=2, max_size=30),
)
def test_pettitt_u_telescopes(cs):
    """U_t can be maintained incrementally: U_t = U_{t-1} +
    Σ_j sgn(x_j − x_t-boundary terms) — pin the O(n²)-vs-O(n³)
    agreement the operator's theta-join formulation relies on."""
    n = len(cs)

    def u_direct(t):
        return sum(
            (cs[j] > cs[i]) - (cs[j] < cs[i])
            for i in range(t + 1)
            for j in range(t + 1, n)
        )

    u_prev = None
    for t in range(n - 1):
        u = u_direct(t)
        if u_prev is not None:
            # incremental identity: moving x_t from "after" to "before"
            delta = sum(
                (cs[j] > cs[t]) - (cs[j] < cs[t]) for j in range(t + 1, n)
            ) - sum((cs[t] > cs[i]) - (cs[t] < cs[i]) for i in range(t))
            assert u == u_prev + delta
        u_prev = u


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(0, 100), min_size=2, max_size=50))
def test_kmv_estimate_is_scale_free(vals):
    """KMV invariant used by the witness: with k ≤ distinct count, the
    estimate depends only on the k-th smallest hash point; duplicates
    in the input never change it."""
    import hashlib

    k = 4
    pts = sorted({int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)
                  for v in vals})
    if len(pts) < k:
        return
    est1 = (k - 1) * (1 << 48) // pts[k - 1]
    pts2 = sorted({int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)
                   for v in vals + vals})
    est2 = (k - 1) * (1 << 48) // pts2[k - 1]
    assert est1 == est2
