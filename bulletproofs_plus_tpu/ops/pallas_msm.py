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


_MOSAIC_OK: bool | None = None
# Dynamic-MSM lane-tile width.  Must stay a multiple of 128 (Mosaic's
# last-block-dim rule); if VMEM ever overflows at 128, the signed-digit
# kernel (half the table VMEM) is the fallback, not a narrower tile.
_LC = 128
# Why pallas is off, if it is (smoke-gate failure or a runtime disable after
# a production-shape kernel failure).  Surfaced by pallas_status() so
# bench.py can record whether pallas was actually active — a silent XLA
# fallback otherwise masquerades as "pallas is no faster" (round-3 verdict).
_OFF_REASON: str | None = None


_FALLBACKS: list = []  # per-shape retries that kept pallas enabled elsewhere


def note_fallback(reason: str) -> None:
    """Record a per-shape XLA fallback (pallas stays enabled for other
    shapes); surfaced by pallas_status()."""
    _FALLBACKS.append(reason)


def disable_runtime(reason: str) -> None:
    """Permanently route this process to the XLA kernels (e.g. after a
    Mosaic resource failure at a real verify/prove shape — the retry seam
    in models/range_proof.py and models/prover_device.py)."""
    global _MOSAIC_OK, _OFF_REASON
    _MOSAIC_OK = False
    if _OFF_REASON is None:
        _OFF_REASON = reason


def runtime_ok() -> bool:
    """True while pallas dispatch is (still) allowed in this process."""
    import os

    return _MOSAIC_OK is not False and os.environ.get("BPPT_PALLAS", "1") == "1"


def pallas_status() -> dict:
    """One-line status for bench.py's `pallas_active` metric."""
    import os

    return {
        "backend": jax.default_backend(),
        "interpret": _interpret(),
        "mosaic_ok": _MOSAIC_OK,
        "lane_tile": _LC,
        "env_enabled": os.environ.get("BPPT_PALLAS", "1") == "1",
        "off_reason": _OFF_REASON,
        "shape_fallbacks": list(_FALLBACKS),
    }


def _trace_state_clean() -> bool:
    """True when no jit/pjit trace is ambient (i.e. ops run eagerly)."""
    try:
        from jax._src.core import trace_state_clean

        return bool(trace_state_clean())
    except Exception:  # private API moved: detect via a staged op instead
        try:
            return not isinstance(jnp.zeros(()), jax.core.Tracer)
        except Exception:
            # Both probes gone (future JAX): assume eager — the smoke's
            # value check still guards correctness, and a wrong guess here
            # only risks an avoidable XLA fallback, never a wrong result.
            return True


def mosaic_available() -> bool:
    """First-use smoke gate for the real Mosaic compiler.

    Compiles + runs both fused kernels on a tiny MSM and checks the value
    against a host-computed expectation.  If Mosaic rejects anything (or the
    result is wrong), warn once and permanently route this process to the
    pure-XLA kernels instead of crashing the caller — the XLA path is always
    correct, just slower.  Interpret mode (CPU tests) skips the gate; the
    test suite exercises those kernels directly.

    MUST run eagerly: under an ambient jit trace the smoke's bool() checks
    would see tracers (the round-3 silent-fallback root cause), and wrapping
    it in ensure_compile_time_eval makes every kernel-internal jnp.zeros /
    identity constant-fold into concrete arrays that Mosaic then rejects as
    captured constants (observed on real TPU, round 4).  So: if called while
    tracing before any eager call decided the gate, return False for THIS
    trace without caching — the host entry points (verify_batch,
    prove_batch_with_rng, verify_batches_pipelined) warm the gate eagerly
    before building their graphs."""
    global _MOSAIC_OK, _LC, _OFF_REASON
    if _MOSAIC_OK is None:
        if _interpret():
            _MOSAIC_OK = True
        elif not _trace_state_clean():
            # Conservative, NOT cached; see docstring.  Record the event so
            # a cold-trace dispatch that permanently baked the XLA path into
            # some jitted graph is visible in pallas_status() / bench output
            # (a silent one cost round 3 its verdict).
            note_fallback("trace-time gate miss (XLA baked into this trace)")
            return False
        else:
            import warnings

            arms = mosaic_smoke_arms(_LC)
            fails = {k: v for k, v in arms.items() if v is not None}
            if not fails:
                _MOSAIC_OK = True
            else:
                detail = "; ".join(f"{k}: {v}" for k, v in fails.items())
                warnings.warn(
                    f"pallas MSM smoke failed [{detail}]; "
                    "falling back to the XLA MSM kernels"
                )
                _MOSAIC_OK = False
                _OFF_REASON = detail
    return _MOSAIC_OK


def _smoke_dyn(lc: int) -> str | None:
    """Multi-tile dynamic MSM (4 tiles at lc=128 — the exact grid shape that
    failed on hardware in round 4) against a host big-int expectation."""
    from . import edwards as ed
    from . import host_ristretto as hr
    from . import ristretto as rist
    from .limbs import pack_ints

    n = 4 * lc
    sc = jnp.asarray(pack_ints([i + 1 for i in range(n)]))
    base = ed.from_host([hr.BASEPOINT])
    pts = ed.PointArray(*(jnp.broadcast_to(c, (n, 16)) for c in base))
    got = msm_kernel_pallas(sc, pts, lc=lc)
    want = ed.from_host([hr.point_mul(n * (n + 1) // 2, hr.BASEPOINT)])
    want = ed.PointArray(*(c[0] for c in want))
    if bool(rist.point_equal(got, want)):
        return None
    return f"dyn n={n} wrong point"


def _smoke_fixed(groups: int = 1) -> str | None:
    """Fixed-base batched MSM; groups=2 exercises the sc=128 pad bump the
    prover's grouped L/R shape compiles (round-4 advisor: that production
    branch had no hardware value-check)."""
    from . import edwards as ed
    from . import host_ristretto as hr
    from . import ristretto as rist
    from .fixed_base import build_tables, transpose_tables
    from .limbs import pack_ints

    s_lanes, f_rows = 64, 8
    host_pts = [hr.point_mul(s + 1, hr.BASEPOINT) for s in range(s_lanes)]
    tables_t = transpose_tables(build_tables(ed.from_host(host_pts)))
    scal = jnp.asarray(
        pack_ints([f + s + 1 for f in range(f_rows) for s in range(s_lanes)])
    ).reshape(f_rows, s_lanes, NLIMBS)
    got_f = fixed_msm_batched_pallas(scal, tables_t, groups=groups)
    per_group = s_lanes // groups
    want_ints = [
        [
            sum(
                (f + s + 1) * (s + 1)
                for s in range(g * per_group, (g + 1) * per_group)
            )
            % hr.L
            for g in range(groups)
        ]
        for f in range(f_rows)
    ]
    want_f = ed.from_host(
        [hr.point_mul(k, hr.BASEPOINT) for row in want_ints for k in row]
    )
    shape = (f_rows, groups) if groups > 1 else (f_rows,)
    want_f = ed.PointArray(*(c.reshape(shape + (NLIMBS,)) for c in want_f))
    if bool(jnp.all(rist.point_equal(got_f, want_f))):
        return None
    return f"fixed groups={groups} wrong point(s)"


def _smoke_pow() -> str | None:
    """Pow chain (ops/pallas_pow.py): x^((p-5)/8) for x = 2..130 vs host."""
    from . import host_ristretto as hr
    from .limbs import pack_ints, unpack_ints
    from .pallas_pow import pow_p58_pallas

    xs = pack_ints([i + 2 for i in range(128)])
    got_p = unpack_ints(np.asarray(pow_p58_pallas(jnp.asarray(xs))))
    e = (hr.P - 5) // 8
    for i, g in enumerate(got_p):
        w = pow(i + 2, e, hr.P)
        if g % hr.P != w:  # pfield is not canonicalizing
            return f"pow lane {i}: got 0x{g % hr.P:x} want 0x{w:x}"
    return None


def mosaic_smoke_arms(lc: int = 128) -> dict:
    """Run every smoke arm independently; {arm: None | failure detail}.
    Exceptions (Mosaic compile/launch rejections) become details too, so one
    broken arm can't mask the others' status."""
    arms = {}
    for name, fn in (
        ("dyn", lambda: _smoke_dyn(lc)),
        ("fixed", lambda: _smoke_fixed(1)),
        ("fixed_g2", lambda: _smoke_fixed(2)),
        ("pow", _smoke_pow),
    ):
        try:
            arms[name] = fn()
        except Exception as e:  # Mosaic compile/launch rejection
            msg = str(e).split("\n")[0][:160]
            arms[name] = f"{type(e).__name__}: {msg}"
    return arms


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


# ---------------------------------------------------------------------------
# Dynamic MSM: per-tile table build + 64-window select + lane reduction
# ---------------------------------------------------------------------------


def _dyn_select(pt: PointS, dig: jnp.ndarray, lc: int) -> PointS:
    """Build T[d] = d*P in VMEM (14 adds), select per window via 15
    compare-selects on the full (limb, window, lane) block."""
    table = [pf.identity((lc,)), pt]
    for _ in range(N_DIGITS - 2):
        table.append(pf.padd(table[-1], pt))
    sel = PointS(*(jnp.broadcast_to(c[:, None, :], (NLIMBS, N_WINDOWS, lc)) for c in table[0]))
    for d in range(1, N_DIGITS):
        mask = (dig == d)[None]  # (1, 64, LC)
        sel = PointS(
            *(
                jnp.where(mask, tc[:, None, :], sc)
                for tc, sc in zip(table[d], sel)
            )
        )
    return sel


def _dyn_select_signed(pt: PointS, dig: jnp.ndarray, lc: int) -> PointS:
    """Signed-digit variant (the TPU shape of dalek's signed-radix
    recoding): digits in [-8, 7], so the in-VMEM table only needs T[1..8] —
    7 adds instead of 14 — and negation is two cheap masked limb
    negations."""
    table = [pf.identity((lc,)), pt]
    for _ in range(7):  # T[2..8]
        table.append(pf.padd(table[-1], pt))
    mag = jnp.abs(dig)
    sel = PointS(*(jnp.broadcast_to(c[:, None, :], (NLIMBS, N_WINDOWS, lc)) for c in table[0]))
    for d in range(1, 9):
        mask = (mag == d)[None]
        sel = PointS(
            *(jnp.where(mask, tc[:, None, :], sc) for tc, sc in zip(table[d], sel))
        )
    negm = (dig < 0)[None]
    return PointS(
        jnp.where(negm, pf.neg(sel.x), sel.x),
        sel.y,
        sel.z,
        jnp.where(negm, pf.neg(sel.t), sel.t),
    )


def _dyn_acc_kernel_body(select_fn, x_ref, y_ref, z_ref, t_ref, dig_ref, *out_refs):
    """Grid (tiles,): select this tile's (limb, window, lane) points and
    accumulate them into the single revisited output block with ONE complete
    add per tile.  The lane fold happens once, in msm_finish — associativity
    re-ordering that cuts the per-tile cost from log2(lc)+1 grid-wide adds
    to one (measured 5x less VPU work; the round-5 first hardware run showed
    the fold-per-tile variant was VPU-bound at ~55 ms for 4096 lanes, barely
    ahead of the XLA path it replaces)."""
    i = pl.program_id(0)
    pt = PointS(x_ref[:], y_ref[:], z_ref[:], t_ref[:])  # (16, LC)
    lc = pt.x.shape[-1]
    sel = select_fn(pt, dig_ref[:], lc)

    @pl.when(i == 0)
    def _():
        for ref, c in zip(out_refs, sel):
            ref[:] = c

    @pl.when(i != 0)
    def _():
        acc = pf.padd(PointS(*(ref[:] for ref in out_refs)), sel)
        for ref, c in zip(out_refs, acc):
            ref[:] = c


def _dyn_acc_kernel(*refs):
    _dyn_acc_kernel_body(_dyn_select, *refs)


def _dyn_acc_signed_kernel(*refs):
    _dyn_acc_kernel_body(_dyn_select_signed, *refs)


def signed_digits4(scalars: jnp.ndarray) -> jnp.ndarray:
    """(n, 16) canonical limbs -> (64, n) int32 signed digits in [-8, 7]
    with sum_j d_j 16^j == s.

    Recoding is the constant-add trick (t = s + 0x88..8, digits minus 8)
    with the nibble carries resolved by a 6-step Kogge-Stone scan — flat
    vector ops, no sequential ripple.  Valid for s < 2^253 (canonical
    scalars), where the carry cannot overflow digit 63."""
    from .msm import digits4

    d = digits4(scalars)  # (64, n) int32 in [0, 15], LSB first
    e = d + 8
    g = (e >= 16).astype(jnp.int32)
    p = (e == 15).astype(jnp.int32)

    def up(a, k):  # shift toward higher windows by k
        return jnp.concatenate([jnp.zeros((k,) + a.shape[1:], a.dtype), a[:-k]], axis=0)

    G, Pp = up(g, 1), up(p, 1)
    k = 1
    while k < N_WINDOWS:
        G = G | (Pp & up(G, k))
        Pp = Pp & up(Pp, k)
        k *= 2
    return ((e + G) & 15) - 8


def _dyn_partials_call(kernel, coords_t: tuple, digits: jnp.ndarray, lc: int):
    n = coords_t[0].shape[-1]
    assert n % lc == 0
    tiles = n // lc
    out_shape = [jax.ShapeDtypeStruct((NLIMBS, N_WINDOWS, lc), jnp.uint32)] * 4
    coord_spec = pl.BlockSpec((NLIMBS, lc), lambda i: (0, i), memory_space=pltpu.VMEM)
    dig_spec = pl.BlockSpec((N_WINDOWS, lc), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (NLIMBS, N_WINDOWS, lc), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        out_shape=out_shape,
        in_specs=[coord_spec] * 4 + [dig_spec],
        out_specs=[out_spec] * 4,
        interpret=_interpret(),
    )(*coords_t, digits)


@functools.partial(jax.jit, static_argnames=("lc",))
def dyn_msm_partials_signed(coords_t: tuple, digits: jnp.ndarray, lc: int = 128):
    """Signed-digit twin of dyn_msm_partials; digits from signed_digits4
    (already bit-reversed by the caller)."""
    return _dyn_partials_call(_dyn_acc_signed_kernel, coords_t, digits, lc)


@functools.partial(jax.jit, static_argnames=("lc",))
def dyn_msm_partials(coords_t: tuple, digits: jnp.ndarray, lc: int = 128):
    """coords_t: 4 arrays (16, n) uint32 (n a multiple of lc, zero-scalar
    padded); digits: (64, n) int32, LSB window first.
    Returns 4 arrays (16, 64, lc): per-(window, lane-slot) points
    accumulated over all tiles (window axis bit-reversed, see
    _finish_kernel)."""
    return _dyn_partials_call(_dyn_acc_kernel, coords_t, digits, lc)


def _brev6(j: int) -> int:
    return int("".join(reversed(f"{j:06b}")), 2)


_BREV6 = np.array([_brev6(j) for j in range(N_WINDOWS)])


# Window-chunk width for the lane-fold grid: holding the full (16, 64, lc)
# accumulator plus padd temporaries in one program blew the 16 MB scoped
# VMEM limit on real hardware (27.8 MB, round-5 run 2), so the finish runs
# as a 4-step grid over window quarters, then a tiny Horner program.
_WQ = 16


def _lane_fold_kernel(x_ref, y_ref, z_ref, t_ref, *out_refs):
    """One window-quarter: fold the lane axis to a single point per window
    (log2(lc) full-width adds, see pfield.lane_halve_sum)."""
    sel = PointS(x_ref[:], y_ref[:], z_ref[:], t_ref[:])  # (16, WQ, lc)
    lc = sel.x.shape[-1]
    folded = pf.lane_halve_sum(sel, axis=2, width=lc)  # (16, WQ, 1)
    for ref, c in zip(out_refs, folded):
        ref[:] = c[:, :, 0][None]  # (1, 16, WQ)


def _horner_kernel(x_ref, y_ref, z_ref, t_ref, *out_refs):
    """Window fold: input windows are BIT-REVERSED (window j at lane
    brev6(j)), so the Horner recombination sum_j 16^j W_j folds by
    contiguous halves: at level l the upper half carries an extra 16^(2^l)
    factor — 4*2^l doublings of a vector whose meaningful width also halves
    each level (252 doublings + 6 additions total, vs 256 width-1 doublings
    + 64 additions for sequential Horner).  Full-width rolls throughout
    (sub-128-lane sliced intermediates miscompiled in round 4)."""
    acc = PointS(x_ref[:], y_ref[:], z_ref[:], t_ref[:])  # (16, 64)
    w = N_WINDOWS
    lvl = 0
    while w > 1:
        w //= 2
        hi = PointS(*(jnp.roll(c, -w, 1) for c in acc))

        def dbl_body(_, p):
            return pf.pdbl(p)

        hi = jax.lax.fori_loop(0, 4 << lvl, dbl_body, hi)
        acc = pf.padd(acc, hi)
        lvl += 1
    for ref, c in zip(out_refs, acc):
        ref[:] = c[:, :1]  # (16, 1): lane 0 holds the fold


@jax.jit
def msm_finish(parts: tuple):
    """4 x (16, 64, lc) bit-reversed tile-accumulated points -> one point."""
    from .edwards import PointArray

    lc = parts[0].shape[-1]
    qs = N_WINDOWS // _WQ
    mid = pl.pallas_call(
        _lane_fold_kernel,
        grid=(qs,),
        # (qs, 16, WQ): the last block dim must equal the array dim (Mosaic
        # divisibility rule), so quarters stack on a leading axis and are
        # reassembled to (16, 64) below, outside the kernel (tiny arrays).
        out_shape=[jax.ShapeDtypeStruct((qs, NLIMBS, _WQ), jnp.uint32)] * 4,
        in_specs=[
            pl.BlockSpec((NLIMBS, _WQ, lc), lambda q: (0, q, 0), memory_space=pltpu.VMEM)
        ]
        * 4,
        out_specs=[
            pl.BlockSpec((1, NLIMBS, _WQ), lambda q: (q, 0, 0), memory_space=pltpu.VMEM)
        ]
        * 4,
        interpret=_interpret(),
    )(*parts)
    mid = tuple(
        jnp.transpose(c, (1, 0, 2)).reshape(NLIMBS, N_WINDOWS) for c in mid
    )
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _horner_kernel,
        out_shape=[jax.ShapeDtypeStruct((NLIMBS, 1), jnp.uint32)] * 4,
        in_specs=[spec] * 4,
        out_specs=[spec] * 4,
        interpret=_interpret(),
    )(*mid)
    return PointArray(*(c[:, 0] for c in outs))


def msm_kernel_pallas(
    scalars: jnp.ndarray, points, lc: int | None = None, signed: bool | None = None
):
    """Drop-in msm_kernel (ops/msm.py) replacement on TPU: same inputs
    ((n, 16) canonical limbs + PointArray), same result point.

    signed=True uses the signed-digit kernel (half the table build/VMEM);
    default comes from BPPT_MSM_SIGNED (A/B via scripts/msm_experiments.py)."""
    import os

    from . import edwards as ed
    from .edwards import PointArray
    from .msm import digits4

    if lc is None:
        lc = _LC
    if signed is None:
        signed = os.environ.get("BPPT_MSM_SIGNED", "0") == "1"
    n = scalars.shape[0]
    target = -(-n // lc) * lc
    if target != n:
        pad = target - n
        scalars = jnp.concatenate([scalars, jnp.zeros((pad, NLIMBS), jnp.uint32)], axis=0)
        idp = ed.identity((pad,))
        points = PointArray(*(jnp.concatenate([c, i], axis=0) for c, i in zip(points, idp)))
    if signed:
        digits = signed_digits4(scalars)  # (64, n) in [-8, 7], LSB first
    else:
        digits = digits4(scalars)  # (64, n) LSB first
    digits = digits[_BREV6]  # window j at row brev6(j) (see _finish_kernel)
    coords_t = tuple(jnp.transpose(c, (1, 0)) for c in points)
    partials = dyn_msm_partials_signed if signed else dyn_msm_partials
    parts = partials(coords_t, digits.astype(jnp.int32), lc=lc)
    return msm_finish(parts)


# ---------------------------------------------------------------------------
# Fixed-base batched MSM over precomputed digit tables
# ---------------------------------------------------------------------------


def _fixed_acc_kernel(tab_x, tab_y, tab_z, tab_t, dig_ref, *out_refs):
    """Grid (f_chunk, chunk, window), window innermost: select this window's
    table entries for every (batch-row, lane) and accumulate the RAW
    selected block into the revisited output with ONE complete add per
    window — the lane fold runs once afterwards (_fixed_fold_kernel), the
    same associativity re-ordering as the dynamic kernel (~7x less padd
    work than folding every window)."""
    w_idx = pl.program_id(2)
    tab = PointS(tab_x[0], tab_y[0], tab_z[0], tab_t[0])  # (16d, 16l, SC)
    dig = dig_ref[0]  # (FC, SC) int32

    sel = pf.identity(dig.shape)
    for d in range(1, N_DIGITS):
        mask = (dig == d)[None]  # (1, FC, SC)
        # tab coords are (16d, 16l, SC): index digit d -> (16l, SC) -> bcast FC
        sel = PointS(
            *(jnp.where(mask, tc[d][:, None, :], s) for tc, s in zip(tab, sel))
        )

    @pl.when(w_idx == 0)
    def _():
        for ref, c in zip(out_refs, sel):
            ref[0] = c

    @pl.when(w_idx != 0)
    def _():
        acc = pf.padd(PointS(*(ref[0] for ref in out_refs)), sel)
        for ref, c in zip(out_refs, acc):
            ref[0] = c


def _fixed_fold_kernel(x_ref, y_ref, z_ref, t_ref, *out_refs):
    """Grid (chunk, f_chunk): fold the lane axis of one accumulated block."""
    sel = PointS(x_ref[0], y_ref[0], z_ref[0], t_ref[0])  # (16, FC, SC)
    sc = sel.x.shape[-1]
    folded = pf.lane_halve_sum(sel, axis=2, width=sc)  # (16, FC, 1)
    for ref, c in zip(out_refs, folded):
        ref[0, 0] = c[:, :, 0]  # (16, FC)


_FC = 32  # batch-row chunk: bounds the accumulator block VMEM (~6 MB peak)


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
    if f <= _FC:
        fc, fpad = f, f  # block dim == array dim satisfies the sublane rule
    else:
        fc = _FC
        fpad = -(-f // fc) * fc
        if fpad != f:  # zero digits select the identity — harmless padding
            digits = jnp.pad(digits, ((0, 0), (0, fpad - f), (0, 0)))
    fq = fpad // fc

    acc = pl.pallas_call(
        _fixed_acc_kernel,
        grid=(fq, chunks, N_WINDOWS),
        out_shape=[jax.ShapeDtypeStruct((chunks, NLIMBS, fpad, sc), jnp.uint32)] * 4,
        in_specs=[
            pl.BlockSpec(
                (1, N_DIGITS, NLIMBS, sc),
                lambda fi, c, w: (w, 0, 0, c),
                memory_space=pltpu.VMEM,
            )
        ]
        * 4
        + [
            pl.BlockSpec(
                (1, fc, sc), lambda fi, c, w: (w, fi, c), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (1, NLIMBS, fc, sc),
                lambda fi, c, w: (c, 0, fi, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 4,
        interpret=_interpret(),
    )(*tables_t, digits)

    mid = pl.pallas_call(
        _fixed_fold_kernel,
        grid=(chunks, fq),
        out_shape=[jax.ShapeDtypeStruct((chunks, fq, NLIMBS, fc), jnp.uint32)] * 4,
        in_specs=[
            pl.BlockSpec(
                (1, NLIMBS, fc, sc),
                lambda c, fi: (c, 0, fi, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 4,
        out_specs=[
            pl.BlockSpec(
                (1, 1, NLIMBS, fc), lambda c, fi: (c, fi, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        * 4,
        interpret=_interpret(),
    )(*acc)
    # (chunks, fq, 16, fc) -> (chunks, 16, fpad) -> slice the padding off
    return tuple(
        jnp.transpose(c, (0, 2, 1, 3)).reshape(chunks, NLIMBS, fpad)[:, :, :f]
        for c in mid
    )


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
    if groups > 1 and sc < 128:
        # Mosaic block rule: the last block dim must be a multiple of 128 or
        # equal the whole array's lane count.  With one group the sc-lane
        # block IS the array; with several, pad each group to 128 lanes
        # (zero digits select the identity — a few extra halving adds).
        sc = 128
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
