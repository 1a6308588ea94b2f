"""Multiscalar multiplication: host Pippenger and batched device ladder.

Replaces the reference's reliance on `curve25519-dalek`'s
`vartime_multiscalar_mul` / `VartimePrecomputedMultiscalarMul`
(/root/reference/src/range_proof.rs:339-345, 482-495, 1050-1062).

Two backends:
  * host: variable-time Pippenger over Python ints — setup paths and the
    correctness oracle.  Never handles secret-dependent timing concerns any
    differently from the reference (which is also vartime here).
  * device: fixed-shape JAX kernels — a 256-bit double-and-add ladder over
    all lanes followed by a binary-tree reduction.  Constant shape, no
    data-dependent control flow; lanes are padded to a power of two with
    (zero scalar, identity point), which the complete addition law absorbs.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from . import edwards as ed
from . import host_ristretto as hr
from .edwards import PointArray
from .limbs import NLIMBS, pack_ints

# ---------------------------------------------------------------------------
# Host Pippenger (variable-time, python ints)
# ---------------------------------------------------------------------------


def _pippenger_window(n: int) -> int:
    if n < 4:
        return 1
    if n < 32:
        return 3
    if n < 256:
        return 5
    if n < 1024:
        return 7
    if n < 8192:
        return 10
    return 13


def host_msm(scalars: Sequence[int], points: Sequence[hr.Point]) -> hr.Point:
    """sum_i scalars[i] * points[i] via bucketed Pippenger."""
    if len(scalars) != len(points):
        raise ValueError("scalar/point length mismatch")
    n = len(scalars)
    if n == 0:
        return hr.IDENTITY
    scalars = [s % hr.L for s in scalars]
    w = _pippenger_window(n)
    nbuckets = (1 << w) - 1
    nwindows = (252 + w) // w  # l < 2^253

    acc = hr.IDENTITY
    for window in reversed(range(nwindows)):
        if window != nwindows - 1:
            for _ in range(w):
                acc = hr.point_double(acc)
        buckets: List[hr.Point] = [hr.IDENTITY] * nbuckets
        shift = window * w
        for s, p in zip(scalars, points):
            digit = (s >> shift) & nbuckets
            if digit:
                buckets[digit - 1] = hr.point_add(buckets[digit - 1], p)
        # sum_b (b+1) * buckets[b] via suffix running sums
        running = hr.IDENTITY
        window_sum = hr.IDENTITY
        for b in reversed(range(nbuckets)):
            running = hr.point_add(running, buckets[b])
            window_sum = hr.point_add(window_sum, running)
        acc = hr.point_add(acc, window_sum)
    return acc


# ---------------------------------------------------------------------------
# Device MSM
# ---------------------------------------------------------------------------


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def _reduce_width(n: int) -> int:
    """Smallest lane count >= n that tree_reduce accepts: a power of two up
    to 512, else a multiple of 512 (avoids ~2x padding waste at large n)."""
    if n <= 512:
        return _next_pow2(n)
    return -(-n // 512) * 512


def pad_msm_inputs(scalars: jnp.ndarray, points: PointArray, target: int | None = None):
    """Pad lanes to `target` (default: the smallest tree_reduce-compatible
    width) with zero scalars and identity points."""
    n = scalars.shape[0]
    m = _reduce_width(n) if target is None else target
    if m == n:
        return scalars, points
    pad = m - n
    scalars = jnp.concatenate([scalars, jnp.zeros((pad, NLIMBS), jnp.uint32)], axis=0)
    idp = ed.identity((pad,))
    points = PointArray(*(jnp.concatenate([c, i], axis=0) for c, i in zip(points, idp)))
    return scalars, points


def tree_reduce(points: PointArray) -> PointArray:
    """Sum points over their LAST lane axis: (..., n) points -> (...) points.

    The lane count must be a power of two up to 512, or any multiple of 512
    beyond that (see _reduce_width).  Two-phase reduction built from exactly
    two point-add bodies (keeps the compiled graph small — unrolled
    log-depth trees made XLA compiles scale with MSM size):
      1. a lax.scan over rows of a (..., R, C) reshape — O(n) work, one body,
         vectorised across every leading batch axis;
      2. a shift-add halving loop over the final C lanes.
    (An unrolled slice-halving variant measured ~2x SLOWER on v5e — the
    strided half-array copies beat the rolls' full-width copies only on
    paper; don't re-try without a device profile.)
    """
    lead = points.x.shape[:-2]
    n = points.x.shape[-2]
    if n == 1:
        return PointArray(*(c[..., 0, :] for c in points))
    C = min(n, 512)
    assert C & (C - 1) == 0 and n % C == 0, "tree_reduce needs pow2<=512 or multiple of 512 lanes"
    R = n // C

    if R > 1:
        # (R, ..., C, NLIMBS): scan axis leading, batch axes preserved
        rows = PointArray(
            *(jnp.moveaxis(c.reshape(lead + (R, C, NLIMBS)), -3, 0) for c in points)
        )
        first = PointArray(*(c[0] for c in rows))
        rest = PointArray(*(c[1:] for c in rows))

        def row_body(acc, row):
            return ed.add(acc, row), None

        acc, _ = jax.lax.scan(row_body, first, rest)
    else:
        acc = points

    steps = C.bit_length() - 1

    def halve_body(k, acc):
        offset = jnp.int32(C) >> (k + 1)
        rolled = PointArray(*(jnp.roll(c, -offset, axis=-2) for c in acc))
        return ed.add(acc, rolled)

    acc = jax.lax.fori_loop(0, steps, halve_body, acc)
    return PointArray(*(c[..., 0, :] for c in acc))


def digits4_nd(scalars: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) uint32 limbs -> (64, ...) 4-bit digits, window-major
    (LSB-first along the leading axis)."""
    parts = [(scalars >> jnp.uint32(4 * k)) & jnp.uint32(0xF) for k in range(4)]
    stacked = jnp.stack(parts, axis=-1)  # (..., 16, 4): limb-major, then nibble
    out = stacked.reshape(scalars.shape[:-1] + (64,))
    return jnp.moveaxis(out, -1, 0).astype(jnp.int32)


def digits4(scalars: jnp.ndarray) -> jnp.ndarray:
    """(N, 16) uint32 limbs -> (64, N) 4-bit digits, window-major (LSB first)."""
    return digits4_nd(scalars)


def _use_pallas_dyn(n: int) -> bool:
    """Route to the fused Mosaic kernel (ops/pallas_msm.py) on TPU for MSMs
    wide enough to amortize its launch; BPPT_PALLAS=0 force-disables."""
    import os

    if os.environ.get("BPPT_PALLAS", "1") != "1":
        return False
    if jax.default_backend() != "tpu" or n < 512:
        return False
    from .pallas_msm import mosaic_available

    return mosaic_available()


@jax.jit
def msm_kernel(scalars: jnp.ndarray, points: PointArray) -> PointArray:
    """sum_i scalars[i] * points[i]; lane count per _reduce_width.

    Transposed 4-bit windowed MSM (window-sum Horner): one 15-add table scan
    (T[d] = d*P per lane), then each of the 64 windows selects T[digit] per
    lane and reduces the lanes to ONE window sum; the window sums fold MSB
    first as acc = 16*acc + W_j.  The 256 doublings of the classic per-lane
    ladder collapse onto a single point, cutting per-lane point ops from
    ~336 (256 dbl + 80 add) to ~80 adds — the doubling ladder no longer
    scales with the MSM size.  Fixed shape, secret-independent control flow.

    On TPU, wide MSMs dispatch to the pallas kernel (ops/pallas_msm.py):
    identical math, but the select + lane reduction stay in VMEM.
    """
    if _use_pallas_dyn(scalars.shape[0]):
        from .pallas_msm import msm_kernel_pallas

        return msm_kernel_pallas(scalars, points)
    zero = ed._identity_like(points)

    def tab_step(acc, _):
        return ed.add(acc, points), acc

    _, table = jax.lax.scan(tab_step, zero, None, length=16)  # table[d] = d*P

    digits = jnp.flip(digits4(scalars), axis=0)  # (64, n), MSB window first

    # Table lookup as ONE one-hot MXU matmul over every window at once:
    # out[w, l, c] = sum_d onehot[w, d, l] * table[d, l, c].  Limbs are
    # < 2^16 and exactly one one-hot term fires, so float32 (HIGHEST) is
    # exact.  This moves the lookup — formerly a 16-way compare+masked-sum
    # per window on the VPU — onto the systolic array.
    tabf = jnp.concatenate(table, axis=-1).astype(jnp.float32)  # (16, n, 64)
    onehot = (
        digits[:, None, :] == jnp.arange(16, dtype=jnp.int32)[None, :, None]
    ).astype(jnp.float32)  # (64, 16, n)
    sel = jnp.einsum(
        "wdl,dlc->wlc", onehot, tabf, precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.uint32)  # (64, n, 64)
    selected = PointArray(
        sel[..., 0:NLIMBS],
        sel[..., NLIMBS : 2 * NLIMBS],
        sel[..., 2 * NLIMBS : 3 * NLIMBS],
        sel[..., 3 * NLIMBS :],
    )
    wsums = tree_reduce(selected)  # (64,) points, MSB window first

    one_pt = PointArray(*(c[0] for c in ed._identity_like(points)))

    def horner(acc, w):
        for _ in range(4):
            acc = ed.double(acc)
        return ed.add(acc, w), None

    acc, _ = jax.lax.scan(horner, one_pt, wsums)
    return acc


def device_msm(scalars: Sequence[int], points: Sequence[hr.Point]) -> hr.Point:
    """Host-convenience wrapper: python ints/points -> device MSM -> host point."""
    if len(scalars) == 0:
        return hr.IDENTITY
    s = jnp.asarray(pack_ints([s % hr.L for s in scalars]))
    p = ed.from_host(list(points))
    s, p = pad_msm_inputs(s, p)
    out = msm_kernel(s, p)
    return ed.to_host(out)


_BACKENDS = {"host": host_msm, "device": device_msm}
_default_backend = "host"


def set_default_backend(name: str) -> None:
    if name not in _BACKENDS:
        raise ValueError(f"unknown msm backend {name!r}")
    global _default_backend
    _default_backend = name


def msm(scalars: Sequence[int], points: Sequence[hr.Point], backend: str | None = None) -> hr.Point:
    """Dispatching MSM over host scalar/point lists."""
    return _BACKENDS[backend or _default_backend](scalars, points)
