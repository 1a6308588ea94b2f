"""Round-4 Mosaic wrong-value diagnostic: the gate now COMPILES all three
pallas kernels on real TPU but the smoke value-check fails.  Localize it:

  A  raw jnp.roll exactness on a 3D (16, 64, 128) u32 tile (axis=2)
  E  pow chain x^((p-5)/8) vs host ints (2D full tiles)
  B  dyn partials (one 128-lane tile) window points vs host
  C  dyn full (partials + finish) vs host
  D  fixed-base batched vs host

    python scripts/mosaic_diag.py

One JSON line per check, printed as soon as it's known.
"""

from __future__ import annotations

import json
import os
import resource
import sys

try:
    resource.setrlimit(resource.RLIMIT_STACK, (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bulletproofs_plus_tpu.ops import edwards as ed  # noqa: E402
from bulletproofs_plus_tpu.ops import host_ristretto as hr  # noqa: E402
from bulletproofs_plus_tpu.ops import pallas_msm as pm  # noqa: E402
from bulletproofs_plus_tpu.ops.limbs import NLIMBS, int_from_limbs, pack_ints  # noqa: E402

P = hr.P


def out(**kw):
    print(json.dumps(kw), flush=True)


def to_int_rows(arr):  # (..., 16) device limbs -> python ints mod p
    a = np.asarray(arr)
    flat = a.reshape(-1, NLIMBS)
    return [int_from_limbs(row) % P for row in flat]


def pt_eq_host(coords, want_pt) -> bool:
    """coords: 4 arrays of 16 limbs (x, y, z, t); want: host extended pt."""
    x, y, z, t = (to_int_rows(c)[0] for c in coords)
    wx, wy, wz, _wt = want_pt
    if z == 0:
        return False
    zi = pow(z, P - 2, P)
    wzi = pow(wz, P - 2, P)
    return (x * zi - wx * wzi) % P == 0 and (y * zi - wy * wzi) % P == 0


# ---- A: raw 3D jnp.roll --------------------------------------------------
rs = np.random.RandomState(5)
big = jnp.asarray(rs.randint(0, 1 << 32, (16, 64, 128), dtype=np.uint64).astype(np.uint32))


def k_roll3(a_ref, o_ref):
    o_ref[:] = jnp.roll(a_ref[:], -64, 2)[:, :, :64]


try:
    got = np.asarray(
        jax.jit(
            pl.pallas_call(
                k_roll3,
                out_shape=jax.ShapeDtypeStruct((16, 64, 64), jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )(big)
    )
    want = np.asarray(big)[:, :, 64:128]
    out(check="A_roll3d", ok=bool((got == want).all()))
except Exception as e:  # noqa: BLE001
    out(check="A_roll3d", ok=False, err=str(e)[:200])


# ---- E: pow chain --------------------------------------------------------
from bulletproofs_plus_tpu.ops.pallas_pow import pow_p58_pallas  # noqa: E402

try:
    xs = pack_ints([i + 2 for i in range(128)])
    got_p = to_int_rows(pow_p58_pallas(jnp.asarray(xs)))
    want_p = [pow(i + 2, (P - 5) // 8, P) for i in range(128)]
    bad = [i for i in range(128) if got_p[i] != want_p[i]]
    out(check="E_pow", ok=not bad, n_bad=len(bad), first_bad=bad[:3])
except Exception as e:  # noqa: BLE001
    out(check="E_pow", ok=False, err=str(e)[:200])


# ---- B/C: dynamic MSM, one tile ------------------------------------------
n = 128
scs = [i + 1 for i in range(n)]
sc = jnp.asarray(pack_ints(scs))
base = ed.from_host([hr.BASEPOINT])
pts = ed.PointArray(*(jnp.broadcast_to(c, (n, 16)) for c in base))

try:
    from bulletproofs_plus_tpu.ops.msm import digits4

    digits = digits4(sc)[pm._BREV6].astype(jnp.int32)
    coords_t = tuple(jnp.transpose(c, (1, 0)) for c in pts)
    parts = pm.dyn_msm_partials(coords_t, digits, lc=128)  # 4 x (1, 16, 64)
    parts_np = [np.asarray(c) for c in parts]
    # host expectation per window j: (sum of digit_j(s) over lanes) * B
    host_dig = np.zeros((64, n), dtype=np.int64)
    for lane, s in enumerate(scs):
        for j in range(64):
            host_dig[j, lane] = (s >> (4 * j)) & 0xF
    n_bad = 0
    first_bad = None
    for row in range(64):
        j = int(pm._BREV6[row])  # window index stored at this row
        k = int(host_dig[j].sum())
        want_pt = hr.point_mul(k, hr.BASEPOINT) if k else (0, 1, 1, 0)
        gotc = [c[0, :, row] for c in parts_np]
        if not pt_eq_host(gotc, want_pt):
            n_bad += 1
            if first_bad is None:
                first_bad = row
    out(check="B_dyn_partials", ok=n_bad == 0, n_bad=n_bad, first_bad=first_bad)
except Exception as e:  # noqa: BLE001
    out(check="B_dyn_partials", ok=False, err=str(e)[:200])

try:
    got = pm.msm_kernel_pallas(sc, pts, lc=128, signed=False)
    want_k = sum(scs)
    ok = pt_eq_host([c for c in got], hr.point_mul(want_k, hr.BASEPOINT))
    out(check="C_dyn_full", ok=bool(ok))
except Exception as e:  # noqa: BLE001
    out(check="C_dyn_full", ok=False, err=str(e)[:200])


# ---- D: fixed-base batched ------------------------------------------------
try:
    from bulletproofs_plus_tpu.ops.fixed_base import build_tables, transpose_tables

    s_lanes, f_rows = 64, 8
    host_pts = [hr.point_mul(s + 1, hr.BASEPOINT) for s in range(s_lanes)]
    tables_t = transpose_tables(build_tables(ed.from_host(host_pts)))
    scal = jnp.asarray(
        pack_ints([f + s + 1 for f in range(f_rows) for s in range(s_lanes)])
    ).reshape(f_rows, s_lanes, NLIMBS)
    got_f = pm.fixed_msm_batched_pallas(scal, tables_t)
    got_np = [np.asarray(c) for c in got_f]
    n_bad = 0
    first_bad = None
    for f in range(f_rows):
        k = sum((f + s + 1) * (s + 1) for s in range(s_lanes)) % hr.L
        if not pt_eq_host([c[f] for c in got_np], hr.point_mul(k, hr.BASEPOINT)):
            n_bad += 1
            if first_bad is None:
                first_bad = f
    out(check="D_fixed", ok=n_bad == 0, n_bad=n_bad, first_bad=first_bad)
except Exception as e:  # noqa: BLE001
    out(check="D_fixed", ok=False, err=str(e)[:200])

out(check="done", ok=True)
