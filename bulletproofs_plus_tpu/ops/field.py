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

from functools import partial

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


def _const(arr: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(arr, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# Generic limb primitives (uint32, radix 2^16)
# ---------------------------------------------------------------------------


def carry_prop(x: jnp.ndarray, out_limbs: int | None = None) -> jnp.ndarray:
    """Full carry propagation; limbs of x may be up to ~2^31.

    Returns (..., out_limbs) with limbs < 2^16; out_limbs defaults to n+1.
    The final limb accumulates the carry-out (caller must size/fold it).
    """
    n = x.shape[-1]
    if out_limbs is None:
        out_limbs = n + 1
    outs = []
    c = jnp.zeros(x.shape[:-1], dtype=jnp.uint32)
    for i in range(n):
        v = x[..., i] + c
        outs.append(v & _MASKV)
        c = v >> _U16
    for _ in range(n, out_limbs - 1):
        outs.append(c & _MASKV)
        c = c >> _U16
    outs.append(c)
    return jnp.stack(outs[:out_limbs], axis=-1)


def mul_limbs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook product of limb vectors (limbs < 2^16, lo/hi split to avoid
    accumulation overflow).  Returns (..., na+nb) carried limbs (< 2^16)."""
    na, nb = a.shape[-1], b.shape[-1]
    prod = a[..., :, None] * b[..., None, :]  # (..., na, nb), exact in uint32
    lo = prod & _MASKV
    hi = prod >> _U16
    acc = jnp.zeros(prod.shape[:-2] + (na + nb,), dtype=jnp.uint32)
    for i in range(na):
        acc = acc.at[..., i : i + nb].add(lo[..., i, :])
        acc = acc.at[..., i + 1 : i + 1 + nb].add(hi[..., i, :])
    # max limb ~ 2*min(na,nb)*2^16 < 2^22 for na,nb <= 32: safe
    return carry_prop(acc, na + nb)


def sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """a - b over equal-width limb vectors. Returns (diff, borrow_out)."""
    n = a.shape[-1]
    outs = []
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    for i in range(n):
        bi = b[..., i] + borrow
        d = a[..., i] - bi  # wraps in uint32; masked below
        borrow = (a[..., i] < bi).astype(jnp.uint32)
        outs.append(d & _MASKV)
    return jnp.stack(outs, axis=-1), borrow


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
    return _fold_to_16(mul_limbs(a, b), 2**512)


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


def pow25519(x: jnp.ndarray, exp: int) -> jnp.ndarray:
    return _pow_bits(x, exp, mul25519, sqr25519, _ONE)


def inv25519(x: jnp.ndarray) -> jnp.ndarray:
    return pow25519(x, P - 2)


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
