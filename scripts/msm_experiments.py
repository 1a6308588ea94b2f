"""A/B the MSM's field-multiply conv backends on the real device.

Each variant needs BPPT_CONV set before import, so the driver re-execs
itself per variant.  Measures (1) exactness of mul25519/mul_l vs host ints,
(2) msm_kernel wall time at 4096 lanes, (3) the fused-prover-shaped
fixed_msm_batched.  Run: python scripts/msm_experiments.py [--cpu]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

VARIANTS = ("f32", "int8")


def run_variant() -> None:
    import resource

    try:
        resource.setrlimit(resource.RLIMIT_STACK, (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
    except (ValueError, OSError):
        pass
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cpu = "--cpu" in sys.argv
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, repo)
    from bulletproofs_plus_tpu.utils.envcache import enable_compile_cache

    enable_compile_cache(cpu=cpu)

    import jax.numpy as jnp

    from bulletproofs_plus_tpu.ops import edwards as ed
    from bulletproofs_plus_tpu.ops import field as F
    from bulletproofs_plus_tpu.ops import host_ristretto as hr
    from bulletproofs_plus_tpu.ops.fixed_base import build_tables, fixed_msm_batched
    from bulletproofs_plus_tpu.ops.limbs import int_from_limbs, pack_ints
    from bulletproofs_plus_tpu.ops.msm import msm_kernel, pad_msm_inputs

    variant = os.environ.get("BPPT_CONV", "f32")

    # 1. exactness: mul25519 and mul_l vs python ints on 64 pseudorandom pairs
    import numpy as np

    rs = np.random.RandomState(7)
    xs = [int.from_bytes(rs.bytes(32), "little") % hr.P for _ in range(64)]
    ys = [int.from_bytes(rs.bytes(32), "little") % hr.P for _ in range(64)]
    xd, yd = jnp.asarray(pack_ints(xs)), jnp.asarray(pack_ints(ys))
    got = np.asarray(jax.jit(F.mul25519)(xd, yd))
    for i in range(64):
        assert int_from_limbs(got[i]) % hr.P == xs[i] * ys[i] % hr.P, f"mul25519 mismatch lane {i}"
    got_l = np.asarray(jax.jit(F.mul_l)(xd, yd))
    for i in range(64):
        assert int_from_limbs(got_l[i]) == xs[i] % hr.L * (ys[i] % hr.L) % hr.L, f"mul_l mismatch lane {i}"

    # 2. dynamic MSM at 4096 lanes
    lanes = 4096
    sc = jnp.asarray(pack_ints([(i * 0x9E3779B97F4A7C15 + 1) % hr.L for i in range(lanes)]))
    base = ed.from_host([hr.BASEPOINT])
    pts = ed.PointArray(*(jnp.broadcast_to(c, (lanes, 16)) for c in base))
    sc2, pts2 = pad_msm_inputs(sc, pts)
    msm_kernel(sc2, pts2).x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        out = msm_kernel(sc2, pts2)
    out.x.block_until_ready()
    msm_ms = (time.perf_counter() - t0) / 5 * 1e3

    # 3. prover-shaped fixed MSM: (B=128, 2, S=130) over 4-bit tables
    S = 130
    tabs = build_tables(ed.from_host([hr.point_mul(3 * i + 1, hr.BASEPOINT) for i in range(S)]))
    fsc = jnp.asarray(
        pack_ints([(i * 0x9E3779B97F4A7C15 + 5) % hr.L for i in range(128 * 2 * S)])
    ).reshape(128, 2, S, 16)
    fn = jax.jit(lambda s: fixed_msm_batched(s, tabs))
    fn(fsc).x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(fsc)
    out.x.block_until_ready()
    fixed_ms = (time.perf_counter() - t0) / 3 * 1e3

    print(
        json.dumps(
            {
                "variant": variant,
                "platform": jax.devices()[0].platform,
                "exactness": "ok",
                "msm_4096_ms": round(msm_ms, 2),
                "fixed_msm_128x2x130_ms": round(fixed_ms, 2),
            }
        ),
        flush=True,
    )


def main() -> None:
    if os.environ.get("BPPT_MSM_EXP_CHILD") == "1":
        run_variant()
        return
    for variant in VARIANTS:
        env = dict(os.environ, BPPT_CONV=variant, BPPT_MSM_EXP_CHILD="1")
        subprocess.run([sys.executable, os.path.abspath(__file__)] + sys.argv[1:], env=env, check=True)


if __name__ == "__main__":
    main()
