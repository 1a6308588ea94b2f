"""Round-4 Mosaic diagnostic #3: the failing partial is (tile 1, window 2) —
127 identity lanes + one non-identity at lane 127.  Reproduce in one tile and
isolate which stage miscomputes on real Mosaic:

  1  dyn_msm_partials on tile-1's exact scalars (129..256), Mosaic
  2  same kernel logic forced through interpret (XLA-on-TPU ground truth)
  3  pure lane_halve_sum kernel: identity everywhere, basepoint at lane 127

    python scripts/mosaic_diag3.py
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
from bulletproofs_plus_tpu.ops import pfield as pf  # noqa: E402
from bulletproofs_plus_tpu.ops.limbs import NLIMBS, int_from_limbs, pack_ints  # noqa: E402
from bulletproofs_plus_tpu.ops.msm import digits4  # noqa: E402

P = hr.P


def out(**kw):
    print(json.dumps(kw), flush=True)


def row_ints(parts_np, row):
    return [int_from_limbs(c[0, :, row]) % P for c in parts_np]


def pt_eq_host(coords_ints, want_pt) -> bool:
    x, y, z, _t = coords_ints
    wx, wy, wz, _wt = want_pt
    if z == 0:
        return False
    zi = pow(z, P - 2, P)
    wzi = pow(wz, P - 2, P)
    return (x * zi - wx * wzi) % P == 0 and (y * zi - wy * wzi) % P == 0


n = 128
scs = [129 + i for i in range(n)]  # tile 1 of the smoke: lane 127 = 256
sc = jnp.asarray(pack_ints(scs))
base = ed.from_host([hr.BASEPOINT])
pts = ed.PointArray(*(jnp.broadcast_to(c, (n, 16)) for c in base))
digits = digits4(sc)[pm._BREV6].astype(jnp.int32)
coords_t = tuple(jnp.transpose(c, (1, 0)) for c in pts)

host_dig = np.zeros((64, n), dtype=np.int64)
for lane, s in enumerate(scs):
    for j in range(64):
        host_dig[j, lane] = (s >> (4 * j)) & 0xF


def check_parts(parts, tag):
    parts_np = [np.asarray(c) for c in parts]
    bad = []
    for row in range(64):
        j = int(pm._BREV6[row])
        k = int(host_dig[j].sum())
        want_pt = hr.point_mul(k, hr.BASEPOINT) if k else (0, 1, 1, 0)
        if not pt_eq_host(row_ints(parts_np, row), want_pt):
            bad.append(row)
    out(check=tag, ok=not bad, bad_rows=bad[:8])
    return parts_np, bad


parts_m, bad_m = check_parts(pm.dyn_msm_partials(coords_t, digits, lc=128), "mosaic_tile1")

pm._INTERPRET = True
parts_i, bad_i = check_parts(pm.dyn_msm_partials(coords_t, digits, lc=128), "interp_tile1")
pm._INTERPRET = False

if bad_m:
    row = bad_m[0]
    out(
        check="dump",
        row=row,
        mosaic=[hex(v) for v in row_ints(parts_m, row)],
        interp=[hex(v) for v in row_ints(parts_i, row)],
        want="BASEPOINT" if int(host_dig[int(pm._BREV6[row])].sum()) == 1 else "other",
    )

# 3. pure halve-sum: identity everywhere except lane 127 = B
idp = pf.identity((n,))  # (16, n) limb-major identity coords
b_lm = tuple(jnp.transpose(c, (1, 0)) for c in base)  # 4 x (16, 1)
mask = (jnp.arange(n) == n - 1)[None, :]
one_pt = pf.PointS(
    *(jnp.where(mask, bc, ic) for bc, ic in zip(b_lm, idp))
)


def k_halve_pt(x_ref, y_ref, z_ref, t_ref, *o_refs):
    p = pf.PointS(x_ref[:], y_ref[:], z_ref[:], t_ref[:])
    s = pf.lane_halve_sum(p, axis=1, width=n)
    for ref, c in zip(o_refs, s):
        ref[:] = c


try:
    outs = pl.pallas_call(
        k_halve_pt,
        out_shape=[jax.ShapeDtypeStruct((NLIMBS, 1), jnp.uint32)] * 4,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
    )(*one_pt)
    got = [int_from_limbs(np.asarray(c)[:, 0]) % P for c in outs]
    out(check="halve_one_pt", ok=pt_eq_host(got, hr.BASEPOINT))
except Exception as e:  # noqa: BLE001
    out(check="halve_one_pt", ok=False, err=str(e)[:200])

out(check="done", ok=True)
