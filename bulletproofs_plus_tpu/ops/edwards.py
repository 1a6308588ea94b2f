"""Batched extended-twisted-Edwards point kernels over GF(2^255-19).

Points live in extended coordinates (X : Y : Z : T), x = X/Z, y = Y/Z,
T = XY/Z, on edwards25519 (a = -1).  The addition law is *complete* for this
curve, so one uniform kernel handles identity, doubling and generic cases —
exactly what fixed-shape TPU code wants (no branches).

A ``PointArray`` is a pytree of four (..., 16) uint32 limb arrays; the
leading axes are batch axes.  This is the TPU-native replacement for the
reference's `curve25519-dalek` `RistrettoPoint` operations
(/root/reference/src/ristretto.rs:26-66).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from .limbs import NLIMBS, limbs_from_int
from . import host_ristretto as hr


class PointArray(NamedTuple):
    """A batch of Edwards points in extended coordinates."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    t: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


_D_LIMBS = limbs_from_int(hr.D)
_D2_LIMBS = limbs_from_int(2 * hr.D % hr.P)
_ONE = limbs_from_int(1)
_ZERO = limbs_from_int(0)


def _bc(const_limbs: np.ndarray, shape) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(const_limbs, dtype=jnp.uint32), tuple(shape) + (NLIMBS,))


def identity(batch_shape=()) -> PointArray:
    return PointArray(
        x=_bc(_ZERO, batch_shape),
        y=_bc(_ONE, batch_shape),
        z=_bc(_ONE, batch_shape),
        t=_bc(_ZERO, batch_shape),
    )


def add(p: PointArray, q: PointArray) -> PointArray:
    """Complete addition, add-2008-hwcd-3 for a = -1 (8M + 1 small).

    The eight field multiplies run as THREE stacked calls (4+1+4 along a new
    leading axis) and the add/subs as two stacked calls: TPU kernels here are
    latency-bound on small vector ops (measured: MSM time is dominated by a
    fixed per-op cost, not lanes), so fewer/wider ops beat the textbook
    one-mul-at-a-time form by ~2.5x at equal FLOPs.
    """
    ys = jnp.stack([p.y, q.y])
    xs = jnp.stack([p.x, q.x])
    diffs = F.sub25519(ys, xs)  # (2, ...): p.y-p.x, q.y-q.x
    sums = F.add25519(ys, xs)  # (2, ...): p.y+p.x, q.y+q.x
    prods = F.mul25519(
        jnp.stack([diffs[0], sums[0], p.t, p.z]),
        jnp.stack([diffs[1], sums[1], q.t, q.z]),
    )
    a, b, pt_qt, pz_qz = prods[0], prods[1], prods[2], prods[3]
    c = F.mul25519(pt_qt, _bc(_D2_LIMBS, pt_qt.shape[:-1]))
    d = F.mul_small25519(pz_qz, 2)
    ef = F.sub25519(jnp.stack([b, d]), jnp.stack([a, c]))
    gh = F.add25519(jnp.stack([d, b]), jnp.stack([c, a]))
    e, f, g, h = ef[0], ef[1], gh[0], gh[1]
    out = F.mul25519(jnp.stack([e, g, f, e]), jnp.stack([f, h, g, h]))
    return PointArray(x=out[0], y=out[1], z=out[2], t=out[3])


def double(p: PointArray) -> PointArray:
    """dbl-2008-hwcd, a = -1 (4M + 4S), squares and output multiplies stacked
    (see `add` for why)."""
    sq = F.sqr25519(jnp.stack([p.x, p.y, p.z, F.add25519(p.x, p.y)]))
    a, b, zz, xy2 = sq[0], sq[1], sq[2], sq[3]
    c = F.mul_small25519(zz, 2)
    ab = F.add25519(a, b)
    eg = F.sub25519(jnp.stack([xy2, b]), jnp.stack([ab, a]))
    e, g = eg[0], eg[1]
    f = F.sub25519(g, c)
    h = F.neg25519(ab)
    out = F.mul25519(jnp.stack([e, g, f, e]), jnp.stack([f, h, g, h]))
    return PointArray(x=out[0], y=out[1], z=out[2], t=out[3])


def neg(p: PointArray) -> PointArray:
    return PointArray(x=F.neg25519(p.x), y=p.y, z=p.z, t=F.neg25519(p.t))


def select(mask: jnp.ndarray, p: PointArray, q: PointArray) -> PointArray:
    """where(mask, p, q); mask shaped like the batch."""
    return PointArray(
        x=F.select(mask, p.x, q.x),
        y=F.select(mask, p.y, q.y),
        z=F.select(mask, p.z, q.z),
        t=F.select(mask, p.t, q.t),
    )


def cond_add(mask: jnp.ndarray, acc: PointArray, p: PointArray) -> PointArray:
    """acc + p where mask else acc (uniform shape, no branches)."""
    return select(mask, add(acc, p), acc)


def _identity_like(p: PointArray) -> PointArray:
    """Identity points with p's batch shape, inheriting p's sharding/vma
    (needed so lax.scan carries type-match inside shard_map)."""
    never = jnp.zeros(p.batch_shape, dtype=bool)
    return select(never, p, identity(p.batch_shape))


def _scalar_bit(scalar: jnp.ndarray, i: int) -> jnp.ndarray:
    """Bit i (LSB order) of (..., 16) uint32 limb scalars -> bool (...)."""
    return ((scalar[..., i // 16] >> jnp.uint32(i % 16)) & 1) == 1


def scalar_mul(scalar: jnp.ndarray, p: PointArray, bits: int = 256) -> PointArray:
    """Batched variable-point scalar multiplication (double-and-add ladder).

    scalar: (..., 16) canonical limbs; p: PointArray with matching batch.
    Fixed 256-iteration lax.scan — constant shape, no secret-dependent
    control flow (every lane does identical work).
    """
    bit_idx = jnp.arange(bits, dtype=jnp.uint32)

    def body(carry, i):
        acc, base = carry
        limb = jax.lax.dynamic_index_in_dim(scalar, (i // 16).astype(jnp.int32), axis=-1, keepdims=False)
        bit = ((limb >> (i % 16)) & 1) == 1
        acc = cond_add(bit, acc, base)
        base = double(base)
        return (acc, base), None

    acc0 = _identity_like(p)
    (acc, _), _ = jax.lax.scan(body, (acc0, p), bit_idx)
    return acc


def double_scalar_mul(
    a: jnp.ndarray, p: PointArray, b: jnp.ndarray, q: PointArray, bits: int = 256
) -> PointArray:
    """Batched a*P + b*Q — Straus with shared 4-bit windows.

    One 15-add table scan per base, then 64 windows of (4 shared doublings +
    2 masked-select additions): ~430 point ops vs ~1024 for the bit ladder.
    """
    del bits
    zero = _identity_like(p)

    def tab_step(base):
        def step(acc, _):
            return add(acc, base), acc

        _, table = jax.lax.scan(step, zero, None, length=16)
        return table  # table[d] = d * base, (16, ...) points

    table_p = tab_step(p)
    table_q = tab_step(q)

    from .msm import digits4_nd

    dig_a = jnp.flip(digits4_nd(a), axis=0)  # (64, ...) MSB window first
    dig_b = jnp.flip(digits4_nd(b), axis=0)
    d_iota_shape = (16,) + (1,) * (a.ndim - 1) + (1,)
    d_iota = jnp.arange(16, dtype=jnp.int32).reshape(d_iota_shape)

    def select_from(table, digit):
        eq = digit[None, ..., None] == d_iota
        return PointArray(
            *(jnp.sum(jnp.where(eq, c, jnp.uint32(0)), axis=0) for c in table)
        )

    def win_body(acc, digits):
        da, db = digits
        for _ in range(4):
            acc = double(acc)
        acc = add(acc, select_from(table_p, da))
        acc = add(acc, select_from(table_q, db))
        return acc, None

    acc, _ = jax.lax.scan(win_body, zero, (dig_a, dig_b))
    return acc


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------


def from_host(points) -> PointArray:
    """List of host_ristretto points (or one point) -> PointArray."""
    single = isinstance(points, tuple) and len(points) == 4 and isinstance(points[0], int)
    pts = [points] if single else list(points)
    arrs = [np.stack([limbs_from_int(p[i]) for p in pts]) for i in range(4)]
    if single:
        arrs = [a[0] for a in arrs]
    return PointArray(*(jnp.asarray(a, dtype=jnp.uint32) for a in arrs))


def to_host(p: PointArray):
    """PointArray -> list of host points (or one point if unbatched)."""
    from .limbs import int_from_limbs

    xs = np.asarray(p.x)
    single = xs.ndim == 1
    arr = [np.asarray(c).reshape(-1, NLIMBS) for c in p]
    n = arr[0].shape[0]
    pts = [
        tuple(int_from_limbs(arr[c][i]) % hr.P for c in range(4))
        for i in range(n)
    ]
    return pts[0] if single else pts
