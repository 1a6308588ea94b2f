"""Vectorised modular arithmetic kernels: GF(2^255-19) and GF(l).

Everything operates on (..., NLIMBS) uint32 arrays (radix 2^16, see limbs.py)
with the batch in the leading axes — the JAX/XLA-native replacement for the
reference's per-element `curve25519-dalek` field ops (Cargo.toml:12).  All
functions are jit-traceable and shape-polymorphic over leading axes.

Invariants:
  * fp (mod 2^255-19): limbs < 2^16, value < 2^256 (lazily reduced);
    canonicalised only at encode/compare time.
  * fl (mod l): always fully reduced (< l) — scalars cross the host/device
    boundary constantly (transcript bytes), so canonical form is the
    representation.

Reduction strategies (chosen for TPU, not ported):
  * mod p: pseudo-Mersenne fold, 2^256 == 38 (mod p).
  * mod l: Barrett reduction (HAC 14.42) with b=2^16, k=16 — fully parallel
    across the batch, no data-dependent loops.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK, NLIMBS, limbs_from_int

# ---------------------------------------------------------------------------
# Moduli and constants
# ---------------------------------------------------------------------------

P = 2**255 - 19
L = 2**252 + 27742317777372353535851937790883648493

_P_LIMBS = limbs_from_int(P)
_L_LIMBS = limbs_from_int(L)
# 4p, limb-wise 4x the canonical p limbs: every limb >= 2^16 so that
# per-limb (4p)_i - b_i + a_i never underflows in sub().
_4P_LIMBWISE = _P_LIMBS.astype(np.uint32) * 4
# 2l limb-wise (for subtraction mod l): every limb of 2*l_limbs... l has a
# zero high region, so limb-wise doubling does NOT give all limbs >= 2^16.
# Instead sub_l computes (a - b) + l with an explicit borrow chain.

# Barrett mu = floor(2^512 / l), 17 limbs
_MU = limbs_from_int(2**512 // L, 17)

_U16 = jnp.uint32(LIMB_BITS)
_MASKV = jnp.uint32(LIMB_MASK)
_U8 = jnp.uint32(8)
_BYTE = jnp.uint32(0xFF)


def _const(arr: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(arr, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# Generic limb primitives (uint32, radix 2^16)
# ---------------------------------------------------------------------------


def _shift_limbs(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift limbs towards higher indices by k, zero-filling (value * b^k)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1]]


def _kogge_stone_carry(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """carry_in[i] = g[i-1] | (p[i-1] & carry_in[i-1]) via log-depth closure.

    g = "this limb generates a carry", p = "this limb propagates one".
    Returns the carry (0/1 uint32) arriving INTO each limb.  Flat vector ops
    (Kogge-Stone) instead of a sequential ripple — keeps compiled graphs
    small and dependency chains log-depth.
    """
    G = _shift_limbs(g, 1)
    P = _shift_limbs(p, 1)
    n = g.shape[-1]
    d = 1
    while d < n:
        Gs = _shift_limbs(G, d)
        Ps = _shift_limbs(P, d)
        G = G | (P & Gs)
        P = P & Ps
        d *= 2
    return G


def carry_prop(x: jnp.ndarray, out_limbs: int | None = None) -> jnp.ndarray:
    """Full carry propagation; limbs of x may be up to 2^32 - 1.

    Returns (..., out_limbs) with limbs < 2^16; out_limbs defaults to n+1.
    The final limb accumulates the carry-out (caller must size/fold it).

    Two carry-save passes reduce limbs to <= 2^16, then one carry-lookahead
    pass resolves the remaining 0/1 ripple exactly.
    """
    n = x.shape[-1]
    if out_limbs is None:
        out_limbs = n + 1
    if out_limbs > n:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (out_limbs - n,), jnp.uint32)], axis=-1
        )
    else:
        assert out_limbs == n, "carry_prop cannot truncate"
    # Pass 1: limbs < 2^17 (carry < 2^16 shifted up one limb)
    x = (x & _MASKV) + _shift_limbs(x >> _U16, 1)
    # Pass 2: limbs <= 2^16 (carry <= 1)
    x = (x & _MASKV) + _shift_limbs(x >> _U16, 1)
    # Lookahead: resolve the remaining 0/1 carries in one shot
    g = x >> _U16  # generate (0/1)
    p = ((x & _MASKV) == _MASKV).astype(jnp.uint32)  # propagate
    carry_in = _kogge_stone_carry(g, p)
    return (x + carry_in) & _MASKV


@functools.lru_cache(maxsize=None)
def _antidiag_matrix(na: int, nb: int) -> np.ndarray:
    """One-hot (na*nb, na+nb-1) f32 matrix T with T[i*nb+j, i+j] = 1.

    Cached as numpy (never a traced value) — converted per use site so jit
    traces see a fresh constant."""
    width = na + nb - 1
    t = np.zeros((na * nb, width), dtype=np.float32)
    for i in range(na):
        for j in range(nb):
            t[i * nb + j, i + j] = 1.0
    return t


def _conv_antidiag(a: jnp.ndarray) -> jnp.ndarray:
    """out[..., k] = sum_i a[..., i, k-i] — polynomial-product accumulation
    of an (..., na, nb) product grid into (..., na+nb-1) coefficients.

    One MXU matmul against a constant one-hot matrix: entries are < 2^16 and
    row sums accumulate < 2^21, both exact in float32 at HIGHEST precision.
    (Kept for callers with sub-2^16 entries; the field multipliers use the
    cheaper byte-plane path below.)
    """
    na, nb = a.shape[-2], a.shape[-1]
    t = jnp.asarray(_antidiag_matrix(na, nb))
    flat = a.reshape(a.shape[:-2] + (na * nb,)).astype(jnp.float32)
    out = jnp.dot(flat, t, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    return out.astype(jnp.uint32)


def _conv_antidiag_int8(a: jnp.ndarray) -> jnp.ndarray:
    """_conv_antidiag via TWO int8 MXU matmuls (byte planes of the < 2^16
    entries) with exact int32 accumulation — int8 runs the systolic array at
    ~12x the f32-HIGHEST rate, so even with the extra pass and the
    plane-recombine this can beat the f32 path (measured per platform; see
    _conv_pair_planes)."""
    na, nb = a.shape[-2], a.shape[-1]
    t = jnp.asarray(_antidiag_matrix(na, nb)).astype(jnp.int8)
    flat = a.reshape(a.shape[:-2] + (na * nb,))
    # 7-bit planes, not bytes: 128..255 would go NEGATIVE as int8 and the
    # two's-complement sums would be off by 256 per high lane; 0..127 planes
    # keep every lane non-negative so the int32 accumulation is exact.
    p0 = (flat & jnp.uint32(0x7F)).astype(jnp.int8)
    p1 = ((flat >> jnp.uint32(7)) & jnp.uint32(0x7F)).astype(jnp.int8)
    p2 = ((flat >> jnp.uint32(14)) & jnp.uint32(0x3)).astype(jnp.int8)
    out = (
        jnp.dot(p0, t, preferred_element_type=jnp.int32)
        + (jnp.dot(p1, t, preferred_element_type=jnp.int32) << 7)
        + (jnp.dot(p2, t, preferred_element_type=jnp.int32) << 14)
    )
    return out.astype(jnp.uint32)


# Conv backend: "f32" (default, measured fastest round 2) or "int8"
# (7-bit-plane MXU passes) — set BPPT_CONV before import to A/B on device
# (scripts/msm_experiments.py drives this).
_CONV_IMPL = _os.environ.get("BPPT_CONV", "f32")


def _conv_pair_planes(prod: jnp.ndarray):
    """Anti-diagonal sums of a (..., na, nb) uint32 product grid, returning
    the (lo16-part, hi16-part) coefficient vectors, each (..., na+nb-1).

    Default: two separate f32 HIGHEST matmuls — measured fastest on v5e in
    round 2.  Rejected variants (measured, do not re-try without a device
    profile): a single stacked matmul over both halves (~35% slower), and
    bf16 byte planes (4 single passes instead of 2x6 HIGHEST passes, ~50%
    slower — the u32<->bf16 conversions and plane recombines cost more than
    the saved MXU passes).  BPPT_CONV=int8 selects the 7-bit-plane int8
    path (6 single passes at the int8 rate) for measurement.
    """
    if _CONV_IMPL == "int8":
        return _conv_antidiag_int8(prod & _MASKV), _conv_antidiag_int8(prod >> _U16)
    lo = _conv_antidiag(prod & _MASKV)  # (..., na+nb-1), entries < 2^20
    hi = _conv_antidiag(prod >> _U16)
    return lo, hi


def mul_limbs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook product of limb vectors (limbs < 2^16, lo/hi split to avoid
    accumulation overflow).  Returns (..., na+nb) carried limbs (< 2^16)."""
    na, nb = a.shape[-1], b.shape[-1]
    prod = a[..., :, None] * b[..., None, :]  # (..., na, nb), exact in uint32
    lo, hi = _conv_pair_planes(prod)  # (..., na+nb-1), limbs < 2^21
    zero = jnp.zeros(lo.shape[:-1] + (1,), jnp.uint32)
    acc = jnp.concatenate([lo, zero], axis=-1) + jnp.concatenate([zero, hi], axis=-1)
    # max limb ~ 2*min(na,nb)*2^16 < 2^22 for na,nb <= 32: safe
    return carry_prop(acc, na + nb)


def sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """a - b over equal-width canonical (< 2^16) limb vectors.

    Returns (diff, borrow_out); borrow-lookahead (flat ops, log depth).
    """
    g = (a < b).astype(jnp.uint32)  # generates a borrow
    p = (a == b).astype(jnp.uint32)  # propagates one
    borrow_in = _kogge_stone_carry(g, p)
    diff = (a - b - borrow_in) & _MASKV
    # borrow out of the top limb: generate there, or propagate + borrow_in
    g_top = g[..., -1]
    p_top = p[..., -1]
    borrow_out = g_top | (p_top & borrow_in[..., -1])
    return diff, borrow_out


def geq(a: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """a >= m over canonical limbs; returns bool (...)."""
    _, borrow = sub_with_borrow(a, jnp.broadcast_to(m, a.shape))
    return borrow == 0


def cond_sub(a: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """a - m if a >= m else a (canonical limbs)."""
    diff, borrow = sub_with_borrow(a, jnp.broadcast_to(m, a.shape))
    return jnp.where((borrow == 0)[..., None], diff, a)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """where(mask, a, b) with mask shaped (...) and a/b (..., n)."""
    return jnp.where(mask[..., None], a, b)


# ---------------------------------------------------------------------------
# GF(2^255 - 19)
# ---------------------------------------------------------------------------

_38 = jnp.uint32(38)


def _fold_to_16(c: jnp.ndarray, bound: int) -> jnp.ndarray:
    """Fold carried limbs down to exactly 16 limbs with value < 2^256,
    using 2^256 == 38 (mod p).

    `bound` is a static (python int) upper bound on the represented value;
    the fold count is derived from it at trace time, so the compiled graph
    has no data-dependent control flow.  From a full 512-bit product this
    takes 3 folds; from additions, 2.
    """
    while bound > 2**256 - 1 and c.shape[-1] > NLIMBS:
        lo = c[..., :NLIMBS]
        hi = c[..., NLIMBS:]
        acc = lo.at[..., : hi.shape[-1]].add(hi * _38)  # limbs < 2^16 + 2^22
        q_max = bound >> 256
        if q_max >= 2:
            bound = (2**256 - 1) + 38 * q_max
        else:
            bound = max(2**256 - 1, bound - 2**256 + 38)
        c = carry_prop(acc, NLIMBS + (1 if bound > 2**256 - 1 else 0))
    assert bound <= 2**256 - 1, "fold failed to converge"
    return c[..., :NLIMBS]


def add25519(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _fold_to_16(carry_prop(a + b, NLIMBS + 1), 2**257)


def sub25519(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod-ish p: adds 4p limb-wise so no per-limb underflow."""
    k = _const(_4P_LIMBWISE)
    return _fold_to_16(carry_prop(a + k - b, NLIMBS + 1), 2**256 + 4 * P)


def neg25519(a: jnp.ndarray) -> jnp.ndarray:
    k = _const(_4P_LIMBWISE)
    return _fold_to_16(carry_prop(jnp.broadcast_to(k, a.shape) - a, NLIMBS + 1), 4 * P)


def mul25519(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular product with the pseudo-Mersenne fold applied BEFORE any carry
    propagation: the two uncarried 31-limb convolution halves (limbs < 2^21)
    fold through 2^256 == 38 while still redundant (limbs stay < 2^27), so
    the expensive 32-limb carry chain of a full 512-bit product never runs —
    only 17-limb carries remain."""
    prod = a[..., :, None] * b[..., None, :]  # exact in uint32
    lo, hi = _conv_pair_planes(prod)  # (..., 31), limbs < 2^21
    z = jnp.zeros(lo.shape[:-1] + (1,), jnp.uint32)
    acc32 = jnp.concatenate([lo, z], axis=-1) + jnp.concatenate([z, hi], axis=-1)
    folded = acc32[..., :NLIMBS] + _38 * acc32[..., NLIMBS:]  # limbs < 2^28
    return _fold_to_16(carry_prop(folded, NLIMBS + 1), 2**270)


def sqr25519(a: jnp.ndarray) -> jnp.ndarray:
    return mul25519(a, a)


def mul_small25519(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Multiply by a small constant (< 2^15)."""
    assert 0 <= k < 2**15
    return _fold_to_16(carry_prop(a * jnp.uint32(k), NLIMBS + 1), k * 2**256)


def canon25519(a: jnp.ndarray) -> jnp.ndarray:
    """Fully reduce to [0, p)."""
    m = _const(_P_LIMBS)
    a = cond_sub(a, m)
    a = cond_sub(a, m)
    return a


def eq25519(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ca, cb = canon25519(a), canon25519(b)
    return jnp.all(ca == cb, axis=-1)


def is_zero25519(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(canon25519(a) == 0, axis=-1)


def is_negative25519(a: jnp.ndarray) -> jnp.ndarray:
    """RFC 9496 negativity: canonical encoding is odd."""
    return (canon25519(a)[..., 0] & 1).astype(bool)


def abs25519(a: jnp.ndarray) -> jnp.ndarray:
    return select(is_negative25519(a), neg25519(a), a)


def _pow_bits(x: jnp.ndarray, exp: int, mul, sqr, one_limbs: np.ndarray) -> jnp.ndarray:
    """Generic left-to-right square-and-multiply with a static exponent,
    implemented as a lax.scan over the exponent's bits (batched over x)."""
    bits = [(exp >> i) & 1 for i in range(exp.bit_length())][::-1]
    bits_arr = jnp.asarray(np.array(bits, dtype=np.uint32))
    one = jnp.broadcast_to(_const(one_limbs), x.shape)

    def body(acc, bit):
        acc = sqr(acc)
        acc = select(bit == 1, mul(acc, x), acc)
        return acc, None

    acc0 = one
    acc, _ = jax.lax.scan(body, acc0, bits_arr)
    return acc


_ONE = limbs_from_int(1)


def _sqr_n(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """x^(2^n) as a fori_loop of squarings (one compiled body)."""
    return jax.lax.fori_loop(0, n, lambda _, a: sqr25519(a), x)


def _chain_250(x: jnp.ndarray):
    """The standard curve25519 addition chain: returns (x^(2^250 - 1), x^11).

    Shared prefix of both special exponents (inversion p-2 = 2^255 - 21 and
    the sqrt exponent (p-5)/8 = 2^252 - 3): ~250 squarings + 11 multiplies,
    vs ~2 ops per exponent bit for generic square-and-multiply — halves the
    sequential depth of every batched decompress/compress.
    """
    z2 = sqr25519(x)
    z9 = mul25519(x, _sqr_n(z2, 2))
    z11 = mul25519(z2, z9)
    z_5_0 = mul25519(z9, sqr25519(z11))  # 2^5 - 2^0
    z_10_0 = mul25519(_sqr_n(z_5_0, 5), z_5_0)
    z_20_0 = mul25519(_sqr_n(z_10_0, 10), z_10_0)
    z_40_0 = mul25519(_sqr_n(z_20_0, 20), z_20_0)
    z_50_0 = mul25519(_sqr_n(z_40_0, 10), z_10_0)
    z_100_0 = mul25519(_sqr_n(z_50_0, 50), z_50_0)
    z_200_0 = mul25519(_sqr_n(z_100_0, 100), z_100_0)
    z_250_0 = mul25519(_sqr_n(z_200_0, 50), z_50_0)
    return z_250_0, z11


def pow_p58(x: jnp.ndarray) -> jnp.ndarray:
    """x^((p-5)/8) = x^(2^252 - 3) (the sqrt_ratio exponent, RFC 9496).

    On TPU, wide batches dispatch to the VMEM-resident pallas chain
    (ops/pallas_pow.py) — same addition chain, two HBM touches instead of
    one per chain op."""
    from .pallas_pow import maybe_pow_p58_pallas

    out = maybe_pow_p58_pallas(x)
    if out is not None:
        return out
    z_250_0, _ = _chain_250(x)
    return mul25519(_sqr_n(z_250_0, 2), x)


def pow25519(x: jnp.ndarray, exp: int) -> jnp.ndarray:
    if exp == (P - 5) // 8:
        return pow_p58(x)
    if exp == P - 2:
        return inv25519(x)
    return _pow_bits(x, exp, mul25519, sqr25519, _ONE)


def inv25519(x: jnp.ndarray) -> jnp.ndarray:
    """x^(p-2) = x^(2^255 - 21) via the addition chain (inv(0) = 0)."""
    z_250_0, z11 = _chain_250(x)
    return mul25519(_sqr_n(z_250_0, 5), z11)


# ---------------------------------------------------------------------------
# GF(l) — scalar field, Barrett reduction, always canonical (< l)
# ---------------------------------------------------------------------------


def barrett_reduce(x: jnp.ndarray) -> jnp.ndarray:
    """Reduce x (any width <= 32 limbs, limbs < 2^16, value < 2^512) mod l.

    HAC Algorithm 14.42 with b = 2^16, k = 16.
    """
    n = x.shape[-1]
    if n < 32:
        x = jnp.concatenate([x, jnp.zeros(x.shape[:-1] + (32 - n,), jnp.uint32)], axis=-1)
    elif n > 32:
        raise ValueError("barrett input too wide")
    mu = _const(_MU)
    lm = _const(_L_LIMBS)
    q1 = x[..., 15:]                      # floor(x / b^(k-1)), 17 limbs
    q2 = mul_limbs(q1, mu)                # 34 limbs
    q3 = q2[..., 17:]                     # floor(q2 / b^(k+1)), 17 limbs
    r1 = x[..., :17]                      # x mod b^(k+1)
    r2 = mul_limbs(q3, lm)[..., :17]      # (q3*l) mod b^(k+1)
    r, borrow = sub_with_borrow(r1, r2)
    # if borrow: r += b^(k+1)  — but with two's-complement limb arithmetic the
    # masked result already equals r1 - r2 + b^17, so nothing to add.
    del borrow
    # r < 3l: subtract l at most twice, then drop the 17th limb (zero).
    lm17 = jnp.concatenate([lm, jnp.zeros((1,), jnp.uint32)])
    r = cond_sub(r, lm17)
    r = cond_sub(r, lm17)
    return r[..., :NLIMBS]


def mul_l(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return barrett_reduce(mul_limbs(a, b))


def sqr_l(a: jnp.ndarray) -> jnp.ndarray:
    return mul_l(a, a)


def add_l(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s = carry_prop(a + b, NLIMBS + 1)
    lm17 = jnp.concatenate([_const(_L_LIMBS), jnp.zeros((1,), jnp.uint32)])
    s = cond_sub(s, lm17)
    return s[..., :NLIMBS]


def sub_l(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod l for canonical a, b."""
    d, borrow = sub_with_borrow(a, b)
    dl = carry_prop(d + _const(_L_LIMBS), NLIMBS)  # a - b + l (no overflow: < 2l < 2^253+)
    return select(borrow == 0, d, dl)


def neg_l(a: jnp.ndarray) -> jnp.ndarray:
    return sub_l(jnp.zeros_like(a), a)


def eq_l(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def is_zero_l(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def pow_l(x: jnp.ndarray, exp: int) -> jnp.ndarray:
    return _pow_bits(x, exp, mul_l, sqr_l, _ONE)


def inv_l(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse mod l (x must be nonzero); inv(0) returns 0."""
    return pow_l(x, L - 2)


def reduce_wide_l(x64: jnp.ndarray) -> jnp.ndarray:
    """(..., 32) limbs (512-bit LE) -> canonical scalar, like
    Scalar::from_bytes_mod_order_wide."""
    return barrett_reduce(x64)
