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


def transpose_tables(tables: PointArray) -> tuple:
    """build_tables coords (64, 16, S, 16) -> the pallas kernels' layout
    (64, 16 digit, 16 limb, S lane) (ops/pallas_msm.py); cached per
    generator set by gens/bulletproof.py and gens/pedersen.py."""
    return tuple(jnp.transpose(c, (0, 1, 3, 2)) for c in tables)


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


def _use_pallas_fixed(s: int, f: int) -> bool:
    """Route to the Mosaic fixed-base kernel (ops/pallas_msm.py) on TPU for
    shapes wide enough to fill its tiles; BPPT_PALLAS=0 force-disables."""
    import os

    import jax as _jax

    if os.environ.get("BPPT_PALLAS", "1") != "1":
        return False
    if _jax.default_backend() != "tpu" or s < 64 or f < 8:
        return False
    from .pallas_msm import mosaic_available

    return mosaic_available()


def fixed_msm_batched(
    scalars: jnp.ndarray, tables: PointArray, allow_pallas: bool = True
) -> PointArray:
    """sum_s scalars[..., s, :] * P_s over FIXED points, batched over any
    leading axes — the workhorse of the fused prover (every round's L/R is a
    fixed-base MSM over the ORIGINAL generators, range_proof.rs:409-495
    recast; see models/prover_device.py).

    On TPU, wide shapes dispatch to the pallas kernel (identical math, VMEM
    -resident select/reduce); pass allow_pallas=False under a GSPMD mesh
    (auto-partitioning cannot split a pallas custom call).

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
    flat_b0 = int(np.prod(lead)) if lead else 1
    if allow_pallas and _use_pallas_fixed(S, flat_b0):
        from .pallas_msm import fixed_msm_batched_pallas

        return fixed_msm_batched_pallas(scalars, transpose_tables(tables))
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


def fixed_msm_grouped(
    scalars: jnp.ndarray, tables: PointArray, groups: int, allow_pallas: bool = True
) -> PointArray:
    """Like fixed_msm_batched, but the table-lane axis is split into `groups`
    contiguous equal chunks that reduce to SEPARATE output points:
    scalars (B, S, 16) + tables with >= S lanes -> (B, groups) points, where
    output g sums lanes [g*S/groups, (g+1)*S/groups).

    Used by the fused prover's round MSMs (models/prover_device.py): L and R
    each touch a known DISJOINT half of the interleaved generator lanes every
    round, so one permuted-table call of width 2mn computes both — half the
    point-add work and half the one-hot select of two full-width MSMs.
    """
    from .msm import _reduce_width, digits4_nd, tree_reduce

    B, S = scalars.shape[0], scalars.shape[-2]
    if allow_pallas and _use_pallas_fixed(S // groups, B):
        from .pallas_msm import fixed_msm_batched_pallas

        return fixed_msm_batched_pallas(scalars, transpose_tables(tables), groups=groups)
    assert S % groups == 0
    chunk = S // groups
    if tables.x.shape[2] != S:
        tables = PointArray(*(c[:, :, :S] for c in tables))
    digits = digits4_nd(scalars)  # (64, B, S), LSB window first
    onehot = (
        digits[..., None] == jnp.arange(N_DIGITS, dtype=jnp.int32)
    ).astype(jnp.float32)  # (64, B, S, 16)
    tabf = jnp.concatenate(tables, axis=-1).astype(jnp.float32)  # (64, 16, S, 64)
    sel = jnp.einsum(
        "wbsd,wdsc->wbsc", onehot, tabf, precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.uint32)  # (64, B, S, 64)
    coords = [sel[..., k * NLIMBS : (k + 1) * NLIMBS] for k in range(4)]
    # (64, B, S, 16) -> (B, groups, 64 * chunk, 16): group lanes stay together
    pts = PointArray(
        *(
            jnp.moveaxis(c.reshape((N_WINDOWS, B, groups, chunk, NLIMBS)), 0, 2)
            .reshape((B, groups, N_WINDOWS * chunk, NLIMBS))
            for c in coords
        )
    )
    total = N_WINDOWS * chunk
    target = _reduce_width(total)
    if target != total:
        pad = ed.identity((B, groups, target - total))
        pts = PointArray(*(jnp.concatenate([c, p], axis=-2) for c, p in zip(pts, pad)))
    return tree_reduce(pts)


@jax.jit
def mixed_msm(
    static_scalars: jnp.ndarray,
    tables: PointArray,
    dynamic_scalars: jnp.ndarray,
    dynamic_points: PointArray,
) -> PointArray:
    """Static (table-driven) + dynamic (ladder) MSM, summed — the analog of
    `vartime_mixed_multiscalar_mul` (range_proof.rs:1050).

    On the pallas path the static lanes simply join the dynamic MSM (their
    base points are table window 0, digit 1): the fused kernel builds its
    tables in VMEM anyway, so precomputed HBM tables buy nothing and one
    kernel beats two."""
    from .msm import _use_pallas_dyn, msm_kernel

    s = static_scalars.shape[0]
    if _use_pallas_dyn(s + dynamic_scalars.shape[0]):
        static_points = PointArray(*(c[0, 1, :s] for c in tables))
        sc = jnp.concatenate([dynamic_scalars, static_scalars], axis=0)
        pts = PointArray(
            *(jnp.concatenate([d, st], axis=0) for d, st in zip(dynamic_points, static_points))
        )
        return msm_kernel(sc, pts)
    return ed.add(
        fixed_msm(static_scalars, tables), msm_kernel(dynamic_scalars, dynamic_points)
    )
