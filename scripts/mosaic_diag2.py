"""Round-4 Mosaic diagnostic #2: the 1-tile dynamic MSM is exact on real
TPU but the 4-tile smoke (n=512) reports a wrong value.  Check the grid>1
pieces: per-(tile, window) partials, then the cross-tile finish.

    python scripts/mosaic_diag2.py
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

from bulletproofs_plus_tpu.ops import edwards as ed  # noqa: E402
from bulletproofs_plus_tpu.ops import host_ristretto as hr  # noqa: E402
from bulletproofs_plus_tpu.ops import pallas_msm as pm  # noqa: E402
from bulletproofs_plus_tpu.ops.limbs import NLIMBS, int_from_limbs, pack_ints  # noqa: E402
from bulletproofs_plus_tpu.ops.msm import digits4  # noqa: E402

P = hr.P


def out(**kw):
    print(json.dumps(kw), flush=True)


def pt_eq_host(coords_ints, want_pt) -> bool:
    x, y, z, _t = coords_ints
    wx, wy, wz, _wt = want_pt
    if z == 0:
        return False
    zi = pow(z, P - 2, P)
    wzi = pow(wz, P - 2, P)
    return (x * zi - wx * wzi) % P == 0 and (y * zi - wy * wzi) % P == 0


n = 512
scs = [i + 1 for i in range(n)]
sc = jnp.asarray(pack_ints(scs))
base = ed.from_host([hr.BASEPOINT])
pts = ed.PointArray(*(jnp.broadcast_to(c, (n, 16)) for c in base))

digits = digits4(sc)[pm._BREV6].astype(jnp.int32)
coords_t = tuple(jnp.transpose(c, (1, 0)) for c in pts)
parts = pm.dyn_msm_partials(coords_t, digits, lc=128)  # 4 x (4, 16, 64)
parts_np = [np.asarray(c) for c in parts]

host_dig = np.zeros((64, n), dtype=np.int64)
for lane, s in enumerate(scs):
    for j in range(64):
        host_dig[j, lane] = (s >> (4 * j)) & 0xF

n_bad = 0
bad_list = []
for tile in range(4):
    lo, hi = tile * 128, (tile + 1) * 128
    for row in range(64):
        j = int(pm._BREV6[row])
        k = int(host_dig[j, lo:hi].sum())
        want_pt = hr.point_mul(k, hr.BASEPOINT) if k else (0, 1, 1, 0)
        gotc = [int_from_limbs(c[tile, :, row]) % P for c in parts_np]
        if not pt_eq_host(gotc, want_pt):
            n_bad += 1
            if len(bad_list) < 6:
                bad_list.append((tile, row))
out(check="partials_4tile", ok=n_bad == 0, n_bad=n_bad, bad=bad_list)

got = pm.msm_finish(parts)
gotc = [int_from_limbs(np.asarray(c)) % P for c in got]
want_k = sum(scs)
ok = pt_eq_host(gotc, hr.point_mul(want_k, hr.BASEPOINT))
out(check="full_4tile", ok=bool(ok))

out(check="done", ok=True)
