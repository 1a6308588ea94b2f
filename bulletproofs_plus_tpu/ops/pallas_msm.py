"""Pallas (Mosaic) MSM kernels: table build + select + lane reduction fused
into single TPU kernels whose field intermediates never leave VMEM.

Why: the XLA tree-reduction path (ops/msm.py, ops/fixed_base.py) moves the
(16, 16) limb product grids of every point addition through HBM — measured
~37 KB of traffic per lane point-add against 768 B of actual point data, so
the device MSMs run at a few percent of the chip's speed of light
(BENCH_r02.json: fraction_of_peak 0.024).  These kernels keep the whole
select -> halving-reduction pipeline in VMEM (ops/pfield.py, limb-major
layout) and leave XLA only the cheap tails (cross-tile reduce, Horner).

Replaces dalek's Pippenger/Straus MSMs for the device engine (the
reference's vartime_multiscalar_mul calls, range_proof.rs:1050-1062);
numerically identical to the ops/msm.py kernels (same complete addition
law), checked by tests/test_pallas_msm.py.

Layout contracts (host side prepares these once per call):
  * dynamic MSM: point coords transposed to (16, n); digits (64, n) int32.
  * fixed-base MSM: digit tables pre-transposed to (64, 16, 16, S) —
    gens/bulletproof.py caches this copy — and digits (64, S, F) for a
    flattened batch F.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pfield as pf
from .limbs import NLIMBS
from .pfield import PointS

N_DIGITS = 16
N_WINDOWS = 64

# Mosaic compiles only on TPU; elsewhere (CPU tests) run the interpreter.
_INTERPRET = False


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


# ---------------------------------------------------------------------------
# Dynamic MSM: per-tile table build + 64-window select + lane reduction
# ---------------------------------------------------------------------------


def _dyn_partials_kernel(x_ref, y_ref, z_ref, t_ref, dig_ref, *out_refs):
    """One lane tile: build T[d] = d*P in VMEM (14 adds), select per window
    via 15 compare-adds on the full (limb, window, lane) block, halve the
    lane axis to per-window partial points."""
    pt = PointS(x_ref[:], y_ref[:], z_ref[:], t_ref[:])  # (16, LC)
    lc = pt.x.shape[-1]

    table = [pf.identity((lc,)), pt]
    for _ in range(N_DIGITS - 2):
        table.append(pf.padd(table[-1], pt))

    dig = dig_ref[:]  # (64, LC) int32
    sel = PointS(*(jnp.broadcast_to(c[:, None, :], (NLIMBS, N_WINDOWS, lc)) for c in table[0]))
    for d in range(1, N_DIGITS):
        mask = (dig == d)[None]  # (1, 64, LC)
        sel = PointS(
            *(
                jnp.where(mask, tc[:, None, :], sc)
                for tc, sc in zip(table[d], sel)
            )
        )
    acc = pf.lane_halve_sum(sel, axis=2, width=lc)  # (16, 64, 1)
    for ref, c in zip(out_refs, acc):
        ref[:] = c[:, :, 0][None]  # (1, 16, 64)


@functools.partial(jax.jit, static_argnames=("lc",))
def dyn_msm_partials(coords_t: tuple, digits: jnp.ndarray, lc: int = 128):
    """coords_t: 4 arrays (16, n) uint32 (n a multiple of lc, zero-scalar
    padded); digits: (64, n) int32, LSB window first.
    Returns 4 arrays (tiles, 16, 64): per-tile per-window partial points."""
    n = coords_t[0].shape[-1]
    assert n % lc == 0
    tiles = n // lc
    out_shape = [jax.ShapeDtypeStruct((tiles, NLIMBS, N_WINDOWS), jnp.uint32)] * 4
    grid = (tiles,)
    coord_spec = pl.BlockSpec((NLIMBS, lc), lambda i: (0, i), memory_space=pltpu.VMEM)
    dig_spec = pl.BlockSpec((N_WINDOWS, lc), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, NLIMBS, N_WINDOWS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _dyn_partials_kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=[coord_spec] * 4 + [dig_spec],
        out_specs=[out_spec] * 4,
        interpret=_interpret(),
    )(*coords_t, digits)


def msm_kernel_pallas(scalars: jnp.ndarray, points, lc: int = 128):
    """Drop-in msm_kernel (ops/msm.py) replacement on TPU: same inputs
    ((n, 16) canonical limbs + PointArray), same result point."""
    from . import edwards as ed
    from .edwards import PointArray
    from .msm import digits4, tree_reduce

    n = scalars.shape[0]
    target = -(-n // lc) * lc
    if target != n:
        pad = target - n
        scalars = jnp.concatenate([scalars, jnp.zeros((pad, NLIMBS), jnp.uint32)], axis=0)
        idp = ed.identity((pad,))
        points = PointArray(*(jnp.concatenate([c, i], axis=0) for c, i in zip(points, idp)))
    digits = digits4(scalars)  # (64, n) LSB first
    coords_t = tuple(jnp.transpose(c, (1, 0)) for c in points)
    parts = dyn_msm_partials(coords_t, digits.astype(jnp.int32), lc=lc)

    # (tiles, 16, 64) -> (64, tiles, 16); reduce tiles; Horner MSB-first.
    tiles = parts[0].shape[0]
    pa = PointArray(*(jnp.transpose(c, (2, 0, 1)) for c in parts))
    t2 = _next_pow2(tiles)
    if t2 != tiles:
        idp = ed.identity((N_WINDOWS, t2 - tiles))
        pa = PointArray(*(jnp.concatenate([c, i], axis=1) for c, i in zip(pa, idp)))
    wsums = tree_reduce(pa)  # (64,) points, LSB window first
    wsums = PointArray(*(jnp.flip(c, axis=0) for c in wsums))  # MSB first

    acc0 = ed.identity(())  # Horner stays in XLA (for now; see module doc)

    def horner(acc, w):
        for _ in range(4):
            acc = ed.double(acc)
        return ed.add(acc, w), None

    acc, _ = jax.lax.scan(horner, acc0, wsums)
    return acc


# ---------------------------------------------------------------------------
# Fixed-base batched MSM over precomputed digit tables
# ---------------------------------------------------------------------------


def _fixed_partials_kernel(tab_x, tab_y, tab_z, tab_t, dig_ref, *out_refs):
    """Grid (chunk, window), window innermost: select this window's table
    entries for every (batch, lane), halve the lane axis, and accumulate the
    per-window point into the output block (kept in VMEM across the window
    sweep because its index map ignores the window axis)."""
    w_idx = pl.program_id(1)
    tab = PointS(tab_x[0], tab_y[0], tab_z[0], tab_t[0])  # (16d, 16l, SC)
    dig = dig_ref[0]  # (F, SC) int32
    f, sc = dig.shape

    sel = pf.identity((f, sc))
    for d in range(1, N_DIGITS):
        mask = (dig == d)[None]  # (1, F, SC)
        # tab coords are (16d, 16l, SC): index digit d -> (16l, SC) -> bcast F
        sel = PointS(
            *(jnp.where(mask, tc[d][:, None, :], s) for tc, s in zip(tab, sel))
        )

    part = pf.lane_halve_sum(sel, axis=2, width=sc)  # (16, F, 1)
    part = PointS(*(c[:, :, 0] for c in part))  # (16, F)

    @pl.when(w_idx == 0)
    def _():
        for ref, c in zip(out_refs, part):
            ref[0] = c

    @pl.when(w_idx != 0)
    def _():
        acc = pf.padd(PointS(*(ref[0] for ref in out_refs)), part)
        for ref, c in zip(out_refs, acc):
            ref[0] = c


@functools.partial(jax.jit, static_argnames=("sc",))
def fixed_msm_partials(tables_t: tuple, digits: jnp.ndarray, sc: int = 128):
    """tables_t: 4 arrays (64, 16, 16, S) uint32 (windows, digit, limb, lane);
    digits: (64, F, S) int32.  S must be a multiple of sc (zero-digit padded).
    Returns 4 arrays (S//sc, 16, F): per-chunk partial points (summed over
    all 64 windows)."""
    f = digits.shape[1]
    s = digits.shape[2]
    assert s % sc == 0, (s, sc)
    chunks = s // sc
    out_shape = [jax.ShapeDtypeStruct((chunks, NLIMBS, f), jnp.uint32)] * 4
    grid = (chunks, N_WINDOWS)
    tab_spec = pl.BlockSpec(
        (1, N_DIGITS, NLIMBS, sc), lambda c, w: (w, 0, 0, c), memory_space=pltpu.VMEM
    )
    dig_spec = pl.BlockSpec((1, f, sc), lambda c, w: (w, 0, c), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, NLIMBS, f), lambda c, w: (c, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fixed_partials_kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=[tab_spec] * 4 + [dig_spec],
        out_specs=[out_spec] * 4,
        interpret=_interpret(),
    )(*tables_t, digits)


def fixed_msm_batched_pallas(scalars: jnp.ndarray, tables_t: tuple, groups: int = 1):
    """Drop-in fixed_msm_batched/_grouped (ops/fixed_base.py) replacement.

    scalars: (..., S0, 16) canonical limbs; tables_t: transposed tables
    (64, 16, 16, S) with S >= S0 lanes.  With groups > 1, S0 splits into
    `groups` contiguous equal chunks reduced to separate points:
    returns (..., groups) points (or (...,) when groups == 1).
    """
    from .edwards import PointArray
    from .msm import digits4_nd, tree_reduce

    lead = scalars.shape[:-2]
    s0 = scalars.shape[-2]
    assert s0 % groups == 0
    per_group = s0 // groups
    f = int(np.prod(lead)) if lead else 1
    flat = scalars.reshape((f, s0, NLIMBS))

    # Chunk size: a power of two; each group padded independently so group
    # boundaries align with chunk boundaries.
    sc = min(128, _next_pow2(per_group))
    padded_group = -(-per_group // sc) * sc
    if padded_group != per_group:
        flat = flat.reshape(f, groups, per_group, NLIMBS)
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, padded_group - per_group), (0, 0)))
        flat = flat.reshape(f, groups * padded_group, NLIMBS)
        # table lanes must be repositioned to match the padded scalar lanes
        tabs = []
        for c in tables_t:
            cg = c[..., :s0].reshape(c.shape[:-1] + (groups, per_group))
            cg = jnp.pad(cg, ((0, 0), (0, 0), (0, 0), (0, 0), (0, padded_group - per_group)))
            tabs.append(cg.reshape(c.shape[:-1] + (groups * padded_group,)))
        tables_t = tuple(tabs)
    else:
        tables_t = tuple(c[..., : groups * padded_group] for c in tables_t)

    digits = digits4_nd(flat).astype(jnp.int32)  # (64, F, S)
    parts = fixed_msm_partials(tables_t, digits, sc=sc)  # 4 x (chunks, 16, F)

    chunks = parts[0].shape[0]
    cpg = chunks // groups  # chunks per group
    pa = PointArray(
        *(
            jnp.transpose(c.reshape(groups, cpg, NLIMBS, f), (3, 0, 1, 2))
            for c in parts
        )
    )  # (F, groups, cpg, 16)
    c2 = _next_pow2(cpg)
    if c2 != cpg:
        from . import edwards as ed

        idp = ed.identity((f, groups, c2 - cpg))
        pa = PointArray(*(jnp.concatenate([c, i], axis=2) for c, i in zip(pa, idp)))
    out = tree_reduce(pa)  # (F, groups)
    if groups == 1:
        return PointArray(*(c.reshape(lead + (NLIMBS,)) for c in out))
    return PointArray(*(c.reshape(lead + (groups, NLIMBS)) for c in out))
