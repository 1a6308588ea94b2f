"""Fixed-base MSM with precomputed 4-bit digit tables.

The TPU-native replacement for dalek's `VartimePrecomputedMultiscalarMul`
(the reference's `Precomputable` handle, /root/reference/src/traits.rs:40-43,
used at range_proof.rs:339-345 and 1044-1062): for FIXED points (the
interleaved G_i/H_i generator vectors) we precompute, once per parameter set,

    T[j, d, i] = d * 16^j * P_i      j in 0..64, d in 0..16

so an MSM over S static points becomes 64 table gathers + ~64*S point
additions — no doubling ladder at all (~8x fewer point ops than the
256-iteration double-and-add ladder, at 256 KB of HBM per point).

Construction cost is one 256-step doubling scan plus 14 batched additions
per window — amortised over every subsequent prove/verify call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import edwards as ed
from .edwards import PointArray
from .limbs import NLIMBS

WINDOW_BITS = 4
N_WINDOWS = 256 // WINDOW_BITS  # 64
N_DIGITS = 1 << WINDOW_BITS  # 16


@jax.jit
def build_tables(points: PointArray) -> PointArray:
    """(S,) points -> (N_WINDOWS, N_DIGITS, S) table of d * 16^j * P_i."""

    def window_step(base, _):
        # base: (S,) points at 16^j; produce this window's 16 multiples
        def digit_step(acc, __):
            return ed.add(acc, base), acc

        zero = ed._identity_like(base)
        _, multiples = jax.lax.scan(digit_step, zero, None, length=N_DIGITS)
        next_base = base
        for _ in range(WINDOW_BITS):
            next_base = ed.double(next_base)
        return next_base, multiples

    _, tables = jax.lax.scan(window_step, points, None, length=N_WINDOWS)
    return tables  # each coord: (N_WINDOWS, N_DIGITS, S, NLIMBS)


def _digits(scalars: jnp.ndarray) -> jnp.ndarray:
    """(S, 16) uint32 limbs -> (N_WINDOWS, S) 4-bit digits, window-major."""
    from .msm import digits4

    return digits4(scalars)


@jax.jit
def fixed_msm(scalars: jnp.ndarray, tables: PointArray) -> PointArray:
    """sum_i scalars[i] * P_i using the precomputed tables.

    scalars: (S, 16) canonical limbs; tables from build_tables.
    64 gathers + tree reduction over (windows x lanes); fixed shape.
    """
    S = scalars.shape[0]
    digits = _digits(scalars)  # (64, S)
    idx = digits[:, None, :, None]  # (64, 1, S, 1)

    gathered = PointArray(
        *(
            jnp.take_along_axis(c, jnp.broadcast_to(idx, (N_WINDOWS, 1, S, NLIMBS)), axis=1)[:, 0]
            for c in tables
        )
    )  # (64, S) points

    # The MSM is simply the sum of every gathered point: one flat reduction
    # over the (windows x lanes) grid.
    from .msm import _reduce_width, tree_reduce

    flat = PointArray(*(c.reshape(N_WINDOWS * S, NLIMBS) for c in gathered))
    total = N_WINDOWS * S
    target = _reduce_width(total)
    if target != total:
        pad = ed.identity((target - total,))
        flat = PointArray(*(jnp.concatenate([c, p], axis=0) for c, p in zip(flat, pad)))
    return tree_reduce(flat)


def fixed_msm_batched(scalars: jnp.ndarray, tables: PointArray) -> PointArray:
    """sum_s scalars[..., s, :] * P_s over FIXED points, batched over any
    leading axes — the workhorse of the fused prover (every round's L/R is a
    fixed-base MSM over the ORIGINAL generators, range_proof.rs:409-495
    recast; see models/prover_device.py).

    scalars: (..., S, 16) canonical limbs; tables: build_tables coords
    (64, 16, S', 16) with S' >= S (extra table lanes are sliced off).

    The per-window table lookup runs as ONE one-hot f32 matmul on the MXU
    (entries < 2^16 and exactly one one-hot term fires, so float32 HIGHEST
    is exact — same trick as ops.msm.msm_kernel), then a halving tree
    reduction sums the (64 x S) selected points per batch element.
    """
    import numpy as np

    from .msm import _reduce_width, digits4_nd, tree_reduce

    lead = scalars.shape[:-2]
    S = scalars.shape[-2]
    if tables.x.shape[2] != S:
        tables = PointArray(*(c[:, :, :S] for c in tables))
    flat_b = int(np.prod(lead)) if lead else 1
    flat = scalars.reshape((flat_b, S, NLIMBS))
    digits = digits4_nd(flat)  # (64, F, S), LSB window first
    onehot = (
        digits[..., None] == jnp.arange(N_DIGITS, dtype=jnp.int32)
    ).astype(jnp.float32)  # (64, F, S, 16)
    tabf = jnp.concatenate(tables, axis=-1).astype(jnp.float32)  # (64, 16, S, 64)
    sel = jnp.einsum(
        "wfsd,wdsc->wfsc", onehot, tabf, precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.uint32)  # (64, F, S, 64)
    coords = [sel[..., k * NLIMBS : (k + 1) * NLIMBS] for k in range(4)]
    pts = PointArray(
        *(jnp.moveaxis(c, 0, 1).reshape((flat_b, N_WINDOWS * S, NLIMBS)) for c in coords)
    )
    total = N_WINDOWS * S
    target = _reduce_width(total)
    if target != total:
        pad = ed.identity((flat_b, target - total))
        pts = PointArray(*(jnp.concatenate([c, p], axis=-2) for c, p in zip(pts, pad)))
    out = tree_reduce(pts)
    return PointArray(*(c.reshape(lead + (NLIMBS,)) for c in out))


@jax.jit
def mixed_msm(
    static_scalars: jnp.ndarray,
    tables: PointArray,
    dynamic_scalars: jnp.ndarray,
    dynamic_points: PointArray,
) -> PointArray:
    """Static (table-driven) + dynamic (ladder) MSM, summed — the analog of
    `vartime_mixed_multiscalar_mul` (range_proof.rs:1050)."""
    from .msm import msm_kernel

    return ed.add(
        fixed_msm(static_scalars, tables), msm_kernel(dynamic_scalars, dynamic_points)
    )
