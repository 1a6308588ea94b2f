"""Limb-major GF(2^255-19) kernels for pallas MSM bodies.

Same mathematics as ops/field.py (pseudo-Mersenne fold before carries,
Kogge-Stone carry resolution) but with the LIMB axis FIRST: values are
(L, ...) uint32 arrays, radix 2^16, any trailing shape.  Inside a Mosaic
kernel the trailing axes map onto (sublane, lane) tiles, so every op runs
full-width on the VPU while limb shifts become cheap leading-axis
concatenations; intermediates (the (16, ...) product planes that dominate
the XLA path's HBM traffic — see ops/msm.py) never leave VMEM.

Constants are python-int literals or scalar fills only: pallas kernels may
not capture array constants, so the 4p subtraction offset is assembled from
three scalar fills and the 2d multiply runs through a constant-coefficient
convolution (mul_const) instead of a captured limb vector.

Pure jnp: these functions trace both inside pl.pallas_call and under plain
jit (tests/test_pfield.py checks them against ops/field.py on CPU).

Replaces curve25519-dalek field arithmetic for the pallas compute path
(reference Cargo.toml:12; the reference has no TPU analog).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from .limbs import NLIMBS, limbs_from_int

P = 2**255 - 19

# p = [0xFFED, 0xFFFF*14, 0x7FFF] so 4p limb-wise is three distinct fills —
# every limb >= 2^16, so per-limb subtraction never underflows.
_4P_LO, _4P_MID, _4P_HI = 4 * 0xFFED, 4 * 0xFFFF, 4 * 0x7FFF

# 2d (edwards25519) as a python limb tuple for mul_const
_D = 37095705934669439343138083508754565189542113879843219016388785533085940283555
_D2_LIMBS = tuple(int(v) for v in limbs_from_int(2 * _D % P))


def _offset_4p(x: jnp.ndarray) -> jnp.ndarray:
    """Limb-wise 4p broadcast against x's trailing shape (no array consts)."""
    trail = x.shape[1:]
    return jnp.concatenate(
        [
            jnp.full((1,) + trail, _4P_LO, jnp.uint32),
            jnp.full((NLIMBS - 2,) + trail, _4P_MID, jnp.uint32),
            jnp.full((1,) + trail, _4P_HI, jnp.uint32),
        ],
        axis=0,
    )


def shift_rows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift limbs toward higher indices by k along axis 0 (value * 2^16k)."""
    if k == 0:
        return x
    z = jnp.zeros((k,) + x.shape[1:], jnp.uint32)
    return jnp.concatenate([z, x[:-k]], axis=0)


def _kogge_stone(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Carry INTO each limb from generate/propagate rows (axis 0)."""
    G = shift_rows(g, 1)
    Pp = shift_rows(p, 1)
    d = 1
    n = g.shape[0]
    while d < n:
        G = G | (Pp & shift_rows(G, d))
        Pp = Pp & shift_rows(Pp, d)
        d *= 2
    return G


def carry_prop(x: jnp.ndarray, out_rows: int) -> jnp.ndarray:
    """Full carry propagation along axis 0; limbs of x < 2^32.

    Returns (out_rows, ...) with limbs < 2^16; out_rows >= x.shape[0]; the
    final limb absorbs the carry-out (caller sizes it).
    """
    n = x.shape[0]
    if out_rows > n:
        x = jnp.concatenate([x, jnp.zeros((out_rows - n,) + x.shape[1:], jnp.uint32)], axis=0)
    else:
        assert out_rows == n, "carry_prop cannot truncate"
    x = (x & 0xFFFF) + shift_rows(x >> 16, 1)
    x = (x & 0xFFFF) + shift_rows(x >> 16, 1)
    g = x >> 16
    p = ((x & 0xFFFF) == 0xFFFF).astype(jnp.uint32)
    return (x + _kogge_stone(g, p)) & 0xFFFF


def conv_planes(a: jnp.ndarray, b: jnp.ndarray):
    """(16, ...) x (16, ...) schoolbook product -> (31, ...) lo/hi planes.

    Statically unrolled anti-diagonal accumulation: plane limbs < 2^20
    (sums of at most 16 sixteen-bit halves), all in registers/VMEM.
    """
    trail = a.shape[1:]
    acc_lo = jnp.zeros((31,) + trail, jnp.uint32)
    acc_hi = jnp.zeros((31,) + trail, jnp.uint32)
    for i in range(NLIMBS):
        prod = a[i : i + 1] * b  # (16, ...), exact: both operands < 2^16
        pad = [(i, 31 - NLIMBS - i)] + [(0, 0)] * len(trail)
        acc_lo = acc_lo + jnp.pad(prod & 0xFFFF, pad)
        acc_hi = acc_hi + jnp.pad(prod >> 16, pad)
    return acc_lo, acc_hi


def _add_row0(x: jnp.ndarray, row: jnp.ndarray) -> jnp.ndarray:
    """x + row placed at limb 0 — concatenate/pad, NOT .at[].add: an indexed
    add lowers to scatter-add, which Mosaic's TPU lowering rejects (observed
    on real hardware, round 4)."""
    z = jnp.zeros((x.shape[0] - 1,) + x.shape[1:], jnp.uint32)
    return x + jnp.concatenate([row, z], axis=0)


def _fold16(c17: jnp.ndarray, bound: int) -> jnp.ndarray:
    """(17, ...) carried limbs, value < `bound` -> (16, ...) limbs < 2^16.

    Limb-major twin of field._fold_to_16 (concat row-adds, no scatter):
    folds the overflow row through 2^256 == 38 REPEATEDLY until the static
    bound proves the value fits 16 limbs.  The single-fold version this
    replaces truncated the final carry-out whenever the folded value landed
    in [2^256, 2^256 + 38*q) — a window deterministically reachable from
    identity-representation add chains (the round-4/5 "wrong value"
    hardware failures; `bound` is a python int, so the loop unrolls at
    trace time with no data-dependent control flow)."""
    while bound > 2**256 - 1:
        out = _add_row0(c17[:NLIMBS], 38 * c17[NLIMBS:])
        q_max = bound >> 256
        if q_max >= 2:
            bound = (2**256 - 1) + 38 * q_max
        else:
            bound = max(2**256 - 1, bound - 2**256 + 38)
        c17 = carry_prop(out, NLIMBS + (1 if bound > 2**256 - 1 else 0))
    return c17[:NLIMBS]


def _finish_mod(acc32: jnp.ndarray) -> jnp.ndarray:
    """(32, ...) limbs < 2^27 -> (16, ...) carried limbs, 2^256 == 38 fold."""
    folded = acc32[:NLIMBS] + 38 * acc32[NLIMBS:]
    return _fold16(carry_prop(folded, NLIMBS + 1), 2**270)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular product, fold-before-carry (mirrors field.mul25519)."""
    lo, hi = conv_planes(a, b)  # (31, ...), limbs < 2^20
    trail = lo.shape[1:]
    z = jnp.zeros((1,) + trail, jnp.uint32)
    acc32 = jnp.concatenate([lo, z], axis=0) + jnp.concatenate([z, hi], axis=0)
    return _finish_mod(acc32)


def mul_const(a: jnp.ndarray, const_limbs: Sequence[int]) -> jnp.ndarray:
    """Multiply by a fixed field element given as 16 python-int limbs —
    the constant enters as scalar literals, never a captured array."""
    trail = a.shape[1:]
    acc_lo = jnp.zeros((31,) + trail, jnp.uint32)
    acc_hi = jnp.zeros((31,) + trail, jnp.uint32)
    for j, k in enumerate(const_limbs):
        if k == 0:
            continue
        prod = a * k  # (16, ...): a < 2^16, k < 2^16
        pad = [(j, 31 - NLIMBS - j)] + [(0, 0)] * len(trail)
        acc_lo = acc_lo + jnp.pad(prod & 0xFFFF, pad)
        acc_hi = acc_hi + jnp.pad(prod >> 16, pad)
    z = jnp.zeros((1,) + trail, jnp.uint32)
    acc32 = jnp.concatenate([acc_lo, z], axis=0) + jnp.concatenate([z, acc_hi], axis=0)
    return _finish_mod(acc32)


def sqr(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


def mul_small(a: jnp.ndarray, k: int) -> jnp.ndarray:
    assert 0 <= k < 2**15
    return _fold16(carry_prop(a * k, NLIMBS + 1), k * 2**256)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _fold16(carry_prop(a + b, NLIMBS + 1), 2**257)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) with a 4p offset so no per-limb underflow."""
    return _fold16(carry_prop(a + _offset_4p(a) - b, NLIMBS + 1), 2**256 + 4 * P)


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return _fold16(carry_prop(_offset_4p(a) - a, NLIMBS + 1), 4 * P)


# ---------------------------------------------------------------------------
# Point kernels (extended twisted Edwards, a = -1), limb-major
# ---------------------------------------------------------------------------


class PointS(NamedTuple):
    """Limb-major Edwards points: 4 coords, each (16, ...) uint32."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    t: jnp.ndarray


def identity(trail) -> PointS:
    shape = (NLIMBS,) + tuple(trail)
    one = jnp.concatenate(
        [jnp.full((1,) + tuple(trail), 1, jnp.uint32), jnp.zeros((NLIMBS - 1,) + tuple(trail), jnp.uint32)],
        axis=0,
    )
    zero = jnp.zeros(shape, jnp.uint32)
    return PointS(zero, one, one, zero)


def padd(p: PointS, q: PointS) -> PointS:
    """Complete addition, add-2008-hwcd-3 for a = -1 (8M + 1 const-mul)."""
    a = mul(sub(p.y, p.x), sub(q.y, q.x))
    b = mul(add(p.y, p.x), add(q.y, q.x))
    c = mul_const(mul(p.t, q.t), _D2_LIMBS)
    d = mul_small(mul(p.z, q.z), 2)
    e = sub(b, a)
    f = sub(d, c)
    g = add(d, c)
    h = add(b, a)
    return PointS(mul(e, f), mul(g, h), mul(f, g), mul(e, h))


def pdbl(p: PointS) -> PointS:
    """dbl-2008-hwcd, a = -1 (4M + 4S)."""
    a = sqr(p.x)
    b = sqr(p.y)
    c = mul_small(sqr(p.z), 2)
    ab = add(a, b)
    e = sub(sqr(add(p.x, p.y)), ab)
    g = sub(b, a)
    f = sub(g, c)
    h = neg(ab)
    return PointS(mul(e, f), mul(g, h), mul(f, g), mul(e, h))


def pselect(mask: jnp.ndarray, p: PointS, q: PointS) -> PointS:
    """where(mask, p, q); mask broadcasts against the trailing axes."""
    return PointS(*(jnp.where(mask, pc, qc) for pc, qc in zip(p, q)))


def lane_halve_sum(p: PointS, axis: int, width: int) -> PointS:
    """Sum a PointS over `axis` (static `width`, a power of two) by repeated
    halving — log2(width) complete additions, zero HBM traffic in-kernel.

    FULL-WIDTH fold: every level adds the array to itself rotated by -w and
    keeps the physical width; only lanes [0, w) stay meaningful (the rest
    hold sums of wrong pairs — still well-formed field elements, never
    read).  Round-4 hardware debugging showed two Mosaic lowering hazards
    with the narrowing variants: offset lane slices ([w:2w]) feeding conv
    concats are rejected outright, and sub-128-lane sliced intermediates
    produced a wrong value in the multi-tile dynamic MSM (BENCH_r04
    off_reason "wrong value at lc=128").  Full-width rolls avoid narrow
    layouts entirely at zero cost — sub-128 widths are lane-padded to the
    full register anyway."""
    assert width & (width - 1) == 0
    w = width
    while w > 1:
        w //= 2
        p = padd(p, PointS(*(jnp.roll(c, -w, axis) for c in p)))
    idx = [slice(None)] * p.x.ndim
    idx[axis] = slice(0, 1)
    idx = tuple(idx)
    return PointS(*(c[idx] for c in p))
