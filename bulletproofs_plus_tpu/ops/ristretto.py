"""Batched ristretto255 encode/decode/equality kernels (RFC 9496).

Device-side counterpart of ``host_ristretto.py``: compression and
decompression of whole batches of points in one fixed-shape pipeline — the
verifier decompresses every proof element of a 256-proof batch in a single
invsqrt ladder.  Canonicality rejection (non-canonical field element,
negative sign, invalid square) is returned as a boolean mask, mirroring
`CompressedRistretto::decompress` returning `Option`
(/root/reference/src/range_proof.rs:859-866 relies on this).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import field as F
from . import host_ristretto as hr
from .edwards import PointArray, identity, select
from .limbs import NLIMBS, limbs_from_int

_SQRT_M1 = limbs_from_int(hr.SQRT_M1)
_INVSQRT_A_MINUS_D = limbs_from_int(hr.INVSQRT_A_MINUS_D)
_D = limbs_from_int(hr.D)
_ONE = limbs_from_int(1)


def _c(limbs, shape):
    return jnp.broadcast_to(jnp.asarray(limbs, dtype=jnp.uint32), tuple(shape) + (NLIMBS,))


def sqrt_ratio_m1(u: jnp.ndarray, v: jnp.ndarray):
    """Batched SQRT_RATIO_M1(u, v) -> (was_square mask, r)."""
    shape = u.shape[:-1]
    v3 = F.mul25519(F.sqr25519(v), v)
    v7 = F.mul25519(F.sqr25519(v3), v)
    r = F.mul25519(F.mul25519(u, v3), F.pow25519(F.mul25519(u, v7), (hr.P - 5) // 8))
    check = F.mul25519(v, F.sqr25519(r))
    neg_u = F.neg25519(u)
    correct = F.eq25519(check, u)
    flipped = F.eq25519(check, neg_u)
    flipped_i = F.eq25519(check, F.mul25519(neg_u, _c(_SQRT_M1, shape)))
    r = F.select(flipped | flipped_i, F.mul25519(r, _c(_SQRT_M1, shape)), r)
    r = F.abs25519(r)
    return correct | flipped, r


def compress(p: PointArray) -> jnp.ndarray:
    """Batched ristretto encode -> (..., 16) canonical limbs of s."""
    shape = p.x.shape[:-1]
    u1 = F.mul25519(F.add25519(p.z, p.y), F.sub25519(p.z, p.y))
    u2 = F.mul25519(p.x, p.y)
    _, invsqrt = sqrt_ratio_m1(_c(_ONE, shape), F.mul25519(u1, F.sqr25519(u2)))
    den1 = F.mul25519(invsqrt, u1)
    den2 = F.mul25519(invsqrt, u2)
    z_inv = F.mul25519(F.mul25519(den1, den2), p.t)
    ix0 = F.mul25519(p.x, _c(_SQRT_M1, shape))
    iy0 = F.mul25519(p.y, _c(_SQRT_M1, shape))
    enchanted = F.mul25519(den1, _c(_INVSQRT_A_MINUS_D, shape))
    rotate = F.is_negative25519(F.mul25519(p.t, z_inv))
    x = F.select(rotate, iy0, p.x)
    y = F.select(rotate, ix0, p.y)
    den_inv = F.select(rotate, enchanted, den2)
    y = F.select(F.is_negative25519(F.mul25519(x, z_inv)), F.neg25519(y), y)
    s = F.abs25519(F.mul25519(den_inv, F.sub25519(p.z, y)))
    return F.canon25519(s)


def decompress(s: jnp.ndarray):
    """Batched ristretto decode from (..., 16) limbs of s.

    Returns (PointArray, valid_mask).  Invalid lanes hold the identity.
    Canonicality: s must be < p and even.
    """
    shape = s.shape[:-1]
    p_limbs = jnp.asarray(limbs_from_int(hr.P), dtype=jnp.uint32)
    canonical = ~F.geq(s, p_limbs)
    nonneg = (s[..., 0] & 1) == 0

    ss = F.sqr25519(s)
    u1 = F.sub25519(_c(_ONE, shape), ss)
    u2 = F.add25519(_c(_ONE, shape), ss)
    u2_sqr = F.sqr25519(u2)
    v = F.sub25519(F.neg25519(F.mul25519(F.mul25519(_c(_D, shape), u1), u1)), u2_sqr)
    was_square, invsqrt = sqrt_ratio_m1(_c(_ONE, shape), F.mul25519(v, u2_sqr))
    den_x = F.mul25519(invsqrt, u2)
    den_y = F.mul25519(F.mul25519(invsqrt, den_x), v)
    x = F.abs25519(F.mul25519(F.mul_small25519(s, 2), den_x))
    y = F.mul25519(u1, den_y)
    t = F.mul25519(x, y)

    ok = canonical & nonneg & was_square & ~F.is_negative25519(t) & ~F.is_zero25519(y)
    pt = PointArray(x=x, y=y, z=_c(_ONE, shape), t=t)
    return select(ok, pt, identity(shape)), ok


def point_equal(p: PointArray, q: PointArray) -> jnp.ndarray:
    """Batched ristretto equality (torsion-insensitive)."""
    c1 = F.eq25519(F.mul25519(p.x, q.y), F.mul25519(p.y, q.x))
    c2 = F.eq25519(F.mul25519(p.y, q.y), F.mul25519(p.x, q.x))
    return c1 | c2


def is_identity(p: PointArray) -> jnp.ndarray:
    return point_equal(p, identity(p.x.shape[:-1]))
