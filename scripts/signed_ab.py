"""A/B the signed-digit pallas dynamic MSM against the unsigned kernel and
the XLA fallback on the real device (round-3 verdict ask #5).

Signed digits halve the in-VMEM table build (7 adds vs 14); this measures
whether that wins at production lane counts.  Run on TPU:

    python scripts/signed_ab.py [lanes ...]

Prints one JSON line per (variant, lanes): wall ms over reps with one final
block (the flat ~28 ms tunnel readback amortises over reps), plus a
host-checked correctness bit at the smallest lane count.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

try:
    resource.setrlimit(resource.RLIMIT_STACK, (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402

from bulletproofs_plus_tpu.utils.envcache import enable_compile_cache  # noqa: E402

enable_compile_cache(cpu=jax.default_backend() == "cpu")

import jax.numpy as jnp  # noqa: E402

from bulletproofs_plus_tpu.ops import edwards as ed  # noqa: E402
from bulletproofs_plus_tpu.ops import host_ristretto as hr  # noqa: E402
from bulletproofs_plus_tpu.ops import ristretto as rist  # noqa: E402
from bulletproofs_plus_tpu.ops.limbs import pack_ints  # noqa: E402
from bulletproofs_plus_tpu.ops.msm import msm_kernel, pad_msm_inputs  # noqa: E402
from bulletproofs_plus_tpu.ops.pallas_msm import msm_kernel_pallas  # noqa: E402

LANES = [int(a) for a in sys.argv[1:]] or [1024, 4096, 8192]
REPS = 5


def inputs(n: int):
    # Distinct points so the kernel can't benefit from broadcast layouts:
    # P_i = (3i+1) * B with scalars s_i = golden-ratio stream mod l.
    sc = jnp.asarray(pack_ints([(i * 0x9E3779B97F4A7C15 + 1) % hr.L for i in range(n)]))
    step = 64  # keep host point_mul cost sane: reuse a small pool of points
    pool = [hr.point_mul(3 * i + 1, hr.BASEPOINT) for i in range(step)]
    pts_host = [pool[i % step] for i in range(n)]
    pts = ed.from_host(pts_host)
    want = None
    if n <= 1024:
        scs = [(i * 0x9E3779B97F4A7C15 + 1) % hr.L for i in range(n)]
        from bulletproofs_plus_tpu.ops.msm import host_msm

        want = ed.from_host([host_msm(scs, pts_host)])
    return sc, pts, want


def time_fn(fn, sc, pts):
    out = fn(sc, pts)
    out.x.block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(sc, pts)
    out.x.block_until_ready()
    return (time.perf_counter() - t0) / REPS * 1e3, out


def main():
    for n in LANES:
        sc, pts, want = inputs(n)
        sc_p, pts_p = pad_msm_inputs(sc, pts)
        variants = {
            "pallas_unsigned": lambda s, p: msm_kernel_pallas(s, p, signed=False),
            "pallas_signed": lambda s, p: msm_kernel_pallas(s, p, signed=True),
        }
        if os.environ.get("BPPT_AB_XLA", "1") == "1":
            os_prev = os.environ.get("BPPT_PALLAS")
            os.environ["BPPT_PALLAS"] = "0"
            ms, out = time_fn(msm_kernel, sc_p, pts_p)
            if os_prev is None:
                del os.environ["BPPT_PALLAS"]
            else:
                os.environ["BPPT_PALLAS"] = os_prev
            ok = bool(rist.point_equal(out, ed.PointArray(*(c[0] for c in want)))) if want else None
            print(json.dumps({"variant": "xla", "lanes": n, "ms": round(ms, 2), "ok": ok}), flush=True)
        for name, fn in variants.items():
            ms, out = time_fn(fn, sc, pts)
            ok = bool(rist.point_equal(out, ed.PointArray(*(c[0] for c in want)))) if want else None
            print(json.dumps({"variant": name, "lanes": n, "ms": round(ms, 2), "ok": ok}), flush=True)


if __name__ == "__main__":
    main()
