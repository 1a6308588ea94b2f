"""Consolidated Mosaic/pallas hardware tooling.

Replaces the round-4 one-off probes (pallas_probe*.py, mosaic_diag*.py,
mosaic_gate_check.py, pallas_smoke.py); their findings live in CLAUDE.md.
Every check prints one JSON line as soon as it is known, so a timeout is
attributable to a specific kernel compile.

Subcommands (run any subset in one process to share the tunnel/compile
warmup):

    python scripts/mosaic_tools.py smoke prod time

  smoke — the per-arm gate checks (ops/pallas_msm.mosaic_smoke_arms)
  prod  — production-shape value checks: 4096 mixed-point dynamic MSM,
          grouped fixed-base at the prover L/R shape (S=128, groups=2),
          pow chain at verifier decompress width
  time  — pallas vs XLA dynamic-MSM wall timing at 4096 lanes, plus the
          signed-digit A/B (BPPT_MSM_SIGNED decision, round-4 verdict #7)
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

try:
    resource.setrlimit(
        resource.RLIMIT_STACK, (resource.RLIM_INFINITY, resource.RLIM_INFINITY)
    )
except (ValueError, OSError):
    pass

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bulletproofs_plus_tpu.ops import edwards as ed  # noqa: E402
from bulletproofs_plus_tpu.ops import host_ristretto as hr  # noqa: E402
from bulletproofs_plus_tpu.ops import pallas_msm as pm  # noqa: E402
from bulletproofs_plus_tpu.ops import ristretto as rist  # noqa: E402
from bulletproofs_plus_tpu.ops.limbs import NLIMBS, pack_ints  # noqa: E402


def out(**kw):
    print(json.dumps(kw), flush=True)


def cmd_smoke():
    t0 = time.time()
    arms = pm.mosaic_smoke_arms(128)
    out(
        check="smoke_arms",
        ok=all(v is None for v in arms.values()),
        arms={k: v or "ok" for k, v in arms.items()},
        secs=round(time.time() - t0, 1),
    )


def _mixed_msm_inputs(n: int):
    """n distinct points P_i = (i+1)*B with scalars s_i = 7i+3; the host
    expectation is sum s_i*(i+1) mod L applied to B."""
    scs = [7 * i + 3 for i in range(n)]
    sc = jnp.asarray(pack_ints(scs))
    host_pts = [hr.point_mul(i + 1, hr.BASEPOINT) for i in range(n)]
    pts = ed.from_host(host_pts)
    k = sum((7 * i + 3) * (i + 1) for i in range(n)) % hr.L
    want = ed.from_host([hr.point_mul(k, hr.BASEPOINT)])
    want = ed.PointArray(*(c[0] for c in want))
    return sc, pts, want


def cmd_prod():
    # 1. dynamic MSM, 4096 mixed points (the verifier's folded-MSM shape)
    t0 = time.time()
    n = 4096
    sc, pts, want = _mixed_msm_inputs(n)
    try:
        got = pm.msm_kernel_pallas(sc, pts)
        ok = bool(rist.point_equal(got, want))
        out(check="prod_dyn4096", ok=ok, secs=round(time.time() - t0, 1))
    except Exception as e:
        out(check="prod_dyn4096", ok=False, err=f"{type(e).__name__}: {e}"[:300])

    # 2. grouped fixed-base at the prover round-MSM shape: B=32, S=128
    #    (2*mn for 64-bit m=1), groups=2
    from bulletproofs_plus_tpu.ops.fixed_base import build_tables, transpose_tables

    t0 = time.time()
    B, S, groups = 32, 128, 2
    host_pts = [hr.point_mul(3 * s + 2, hr.BASEPOINT) for s in range(S)]
    tables_t = transpose_tables(build_tables(ed.from_host(host_pts)))
    scal = jnp.asarray(
        pack_ints([(f * 5 + s * 11 + 1) for f in range(B) for s in range(S)])
    ).reshape(B, S, NLIMBS)
    try:
        got = pm.fixed_msm_batched_pallas(scal, tables_t, groups=groups)
        per = S // groups
        want_ints = [
            [
                sum(
                    (f * 5 + s * 11 + 1) * (3 * s + 2)
                    for s in range(g * per, (g + 1) * per)
                )
                % hr.L
                for g in range(groups)
            ]
            for f in range(B)
        ]
        want = ed.from_host(
            [hr.point_mul(k, hr.BASEPOINT) for row in want_ints for k in row]
        )
        want = ed.PointArray(*(c.reshape(B, groups, NLIMBS) for c in want))
        ok = bool(jnp.all(rist.point_equal(got, want)))
        out(check="prod_fixed_g2_S128", ok=ok, secs=round(time.time() - t0, 1))
    except Exception as e:
        out(check="prod_fixed_g2_S128", ok=False, err=f"{type(e).__name__}: {e}"[:300])

    # 3. pow chain at verifier decompress width (B*K lanes, 2048)
    from bulletproofs_plus_tpu.ops.limbs import unpack_ints
    from bulletproofs_plus_tpu.ops.pallas_pow import pow_p58_pallas

    t0 = time.time()
    npow = 2048
    xs = [(i * 2654435761 + 17) % hr.P for i in range(npow)]
    try:
        got_p = unpack_ints(np.asarray(pow_p58_pallas(jnp.asarray(pack_ints(xs)))))
        e = (hr.P - 5) // 8
        bad = [
            i for i, (g, x) in enumerate(zip(got_p, xs)) if g % hr.P != pow(x, e, hr.P)
        ]
        out(
            check="prod_pow2048",
            ok=not bad,
            bad_lanes=bad[:4],
            secs=round(time.time() - t0, 1),
        )
    except Exception as e:
        out(check="prod_pow2048", ok=False, err=f"{type(e).__name__}: {e}"[:300])


def _dyn_partials_check(tag, scs, host_pts_ints, lc=128):
    """Run dyn partials + finish on (scalars, points); check each
    (window, lane-slot) tile-accumulated point AND the finished point
    against host ints."""
    from bulletproofs_plus_tpu.ops.limbs import int_from_limbs
    from bulletproofs_plus_tpu.ops.msm import digits4

    n = len(scs)
    sc = jnp.asarray(pack_ints(scs))
    pts = ed.from_host([hr.point_mul(k, hr.BASEPOINT) for k in host_pts_ints])
    digits = digits4(sc)[pm._BREV6].astype(jnp.int32)
    coords_t = tuple(jnp.transpose(c, (1, 0)) for c in pts)
    try:
        parts = pm.dyn_msm_partials(coords_t, digits, lc=lc)
    except Exception as e:
        out(check=f"dynmatrix_{tag}", ok=False, err=f"{type(e).__name__}: {e}"[:200])
        return
    parts_np = [np.asarray(c) for c in parts]  # 4 x (16, 64, lc)
    tiles = n // lc

    def pt_eq(coords_ints, want_pt) -> bool:
        x, y, zc, _t = coords_ints
        wx, wy, wz, _wt = want_pt
        if zc % hr.P == 0:
            return False
        zi = pow(zc, hr.P - 2, hr.P)
        wzi = pow(wz, hr.P - 2, hr.P)
        return (x * zi - wx * wzi) % hr.P == 0 and (y * zi - wy * wzi) % hr.P == 0

    bad = []
    for row in range(64):
        j = int(pm._BREV6[row])
        for slot in range(lc):
            k = sum(
                ((scs[t * lc + slot] >> (4 * j)) & 0xF) * host_pts_ints[t * lc + slot]
                for t in range(tiles)
            )
            want = hr.point_mul(k % hr.L, hr.BASEPOINT) if k % hr.L else (0, 1, 1, 0)
            got = [int_from_limbs(c[:, row, slot]) % hr.P for c in parts_np]
            if not pt_eq(got, want):
                bad.append({"win": j, "row": row, "slot": slot})
        if len(bad) > 12:
            break
    # finish stage on the (possibly wrong) partials
    fin = pm.msm_finish(parts)
    total = sum(s * p for s, p in zip(scs, host_pts_ints)) % hr.L
    want_fin = ed.from_host([hr.point_mul(total, hr.BASEPOINT)])
    want_fin = ed.PointArray(*(c[0] for c in want_fin))
    fin_ok = bool(rist.point_equal(fin, want_fin))
    out(
        check=f"dynmatrix_{tag}",
        ok=not bad and fin_ok,
        partials_bad=bad[:6],
        n_bad=len(bad),
        finish_ok=fin_ok,
        tiles=tiles,
    )


def cmd_lint():
    """Client-side lowering of every pallas entry point for the TPU target —
    catches structural Mosaic rejections (block-shape rules, unsupported
    ops) in seconds, without a remote compile.  VMEM OOMs only surface at
    real compile; this can't catch those."""
    import jax.numpy as jnp2

    from bulletproofs_plus_tpu.ops.pallas_pow import _pow_p58_tiles

    u32 = jnp2.uint32
    sds = jax.ShapeDtypeStruct
    checks = []
    for tiles in (1, 4, 32):
        n = tiles * 128
        coords = tuple(sds((NLIMBS, n), u32) for _ in range(4))
        digs = sds((64, n), jnp2.int32)
        checks.append((f"dyn_partials_t{tiles}", lambda c=coords, d=digs: pm.dyn_msm_partials.lower(c, d, lc=128)))
        checks.append((f"dyn_partials_signed_t{tiles}", lambda c=coords, d=digs: pm.dyn_msm_partials_signed.lower(c, d, lc=128)))
    checks.append(("msm_finish", lambda: pm.msm_finish.lower(tuple(sds((NLIMBS, 64, 128), u32) for _ in range(4)))))
    for f, s, sc in ((8, 64, 64), (32, 128, 128), (128, 256, 128)):
        tabs = tuple(sds((64, 16, NLIMBS, s), u32) for _ in range(4))
        digs = sds((64, f, s), jnp2.int32)
        checks.append((f"fixed_partials_f{f}_s{s}", lambda t=tabs, d=digs, c=sc: pm.fixed_msm_partials.lower(t, d, sc=c)))
    checks.append(("pow_tiles", lambda: _pow_p58_tiles.lower(sds((NLIMBS, 256), u32), lc=256)))
    for name, fn in checks:
        try:
            fn()
            out(check=f"lint_{name}", ok=True)
        except Exception as e:
            out(check=f"lint_{name}", ok=False, err=f"{type(e).__name__}: {e}"[:200])


def cmd_dynmatrix():
    """Bisect the dyn n=512 smoke failure: which (tile, window) partial is
    wrong, and does it track n / scalar pattern / broadcast-vs-distinct
    points?  (smoke arms: dyn n=512 bcast 1..512 FAILS; prod n=4096
    distinct 7i+3 PASSES — round-5 first hardware run.)"""
    # A: the failing smoke config exactly
    _dyn_partials_check("A_512_seq_bcast", [i + 1 for i in range(512)], [1] * 512)
    # B: same scalars, distinct points
    _dyn_partials_check(
        "B_512_seq_distinct", [i + 1 for i in range(512)], [i + 1 for i in range(512)]
    )
    # C: prod-style scalars, broadcast point
    _dyn_partials_check("C_512_7i3_bcast", [7 * i + 3 for i in range(512)], [1] * 512)
    # D: one tile, the round-4 failing tile-1 data (single digit at lane 127)
    _dyn_partials_check("D_128_tile1_bcast", [129 + i for i in range(128)], [1] * 128)


def _time_msm(fn, sc, pts, reps=5):
    r = fn(sc, pts)  # compile + warm
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(sc, pts)
        jax.block_until_ready(r)
    return (time.time() - t0) / reps * 1000.0


def cmd_time():
    n = 4096
    sc, pts, want = _mixed_msm_inputs(n)

    from bulletproofs_plus_tpu.ops.msm import msm_kernel

    old = os.environ.get("BPPT_PALLAS")
    os.environ["BPPT_PALLAS"] = "0"
    ms_xla = _time_msm(lambda s, p: msm_kernel(s, p), sc, pts)
    if old is None:
        del os.environ["BPPT_PALLAS"]
    else:
        os.environ["BPPT_PALLAS"] = old
    out(check="time_dyn4096_xla", wall_ms=round(ms_xla, 2))

    for signed in (False, True):
        try:
            ms = _time_msm(
                lambda s, p, sg=signed: pm.msm_kernel_pallas(s, p, signed=sg), sc, pts
            )
            got = pm.msm_kernel_pallas(sc, pts, signed=signed)
            ok = bool(rist.point_equal(got, want))
            out(
                check=f"time_dyn4096_pallas_{'signed' if signed else 'unsigned'}",
                wall_ms=round(ms, 2),
                ok=ok,
                speedup_vs_xla=round(ms_xla / ms, 2),
            )
        except Exception as e:
            out(
                check=f"time_dyn4096_pallas_{'signed' if signed else 'unsigned'}",
                ok=False,
                err=f"{type(e).__name__}: {e}"[:300],
            )


def main():
    cmds = sys.argv[1:] or ["smoke"]
    out(start=True, backend=jax.default_backend(), cmds=cmds)
    for c in cmds:
        {
            "smoke": cmd_smoke,
            "prod": cmd_prod,
            "time": cmd_time,
            "dynmatrix": cmd_dynmatrix,
            "lint": cmd_lint,
        }[c]()
    out(check="done", ok=True)


if __name__ == "__main__":
    main()
