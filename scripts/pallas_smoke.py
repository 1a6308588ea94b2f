"""Pallas MSM kernels on the real TPU: exactness vs the host oracle, then
wall timings.  Run alone (1 CPU core — no concurrent heavy processes):

    python scripts/pallas_smoke.py

Prints one JSON line per check.  BPPT_PALLAS=0 would disable the dispatch;
this script asserts the pallas path is actually taken (platform == tpu).
"""

from __future__ import annotations

import json
import os
import resource
import time

try:
    resource.setrlimit(resource.RLIMIT_STACK, (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

import sys

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
from bulletproofs_plus_tpu.utils.envcache import enable_compile_cache  # noqa: E402

enable_compile_cache(cpu=False)

import jax.numpy as jnp
import numpy as np

from bulletproofs_plus_tpu.ops import edwards as ed
from bulletproofs_plus_tpu.ops import host_ristretto as hr
from bulletproofs_plus_tpu.ops.fixed_base import build_tables, fixed_msm_batched, fixed_msm_grouped
from bulletproofs_plus_tpu.ops.limbs import pack_ints
from bulletproofs_plus_tpu.ops.msm import host_msm, msm_kernel, pad_msm_inputs

print(json.dumps({"check": "platform", "value": jax.devices()[0].platform}), flush=True)


def emit(check, **kw):
    print(json.dumps({"check": check, **kw}), flush=True)


# --- dynamic MSM exactness at 512 lanes (the pallas dispatch threshold) ----
n = 512
scalars = [(i * 0x9E3779B97F4A7C15 + 3) % hr.L for i in range(n)]
pts = [hr.point_mul(2 * i + 1, hr.BASEPOINT) for i in range(97)]
pts = [pts[i % 97] for i in range(n)]
sc = jnp.asarray(pack_ints(scalars))
pa = ed.from_host(pts)
t0 = time.perf_counter()
got = msm_kernel(sc, pa)
got_h = ed.to_host(got)
emit("dyn_512_compile_s", value=round(time.perf_counter() - t0, 1))
want = host_msm(scalars, pts)
emit("dyn_512_exact", ok=hr.point_equal(got_h, want))

# --- fixed-base batched exactness (B=8, S=128) -----------------------------
S, B = 128, 8
base_pts = [hr.point_mul(5 * i + 2, hr.BASEPOINT) for i in range(S)]
tables = build_tables(ed.from_host(base_pts))
rs = np.random.RandomState(11)
scal = [[int.from_bytes(rs.bytes(32), "little") % hr.L for _ in range(S)] for _ in range(B)]
fsc = jnp.asarray(pack_ints([v for row in scal for v in row])).reshape(B, S, 16)
t0 = time.perf_counter()
gotf = fixed_msm_batched(fsc, tables)
gotf_h = [ed.to_host(ed.PointArray(*(np.asarray(c)[b] for c in gotf))) for b in range(B)]
emit("fixed_8x128_compile_s", value=round(time.perf_counter() - t0, 1))
ok = all(
    hr.point_equal(gotf_h[b], host_msm(scal[b], base_pts)) for b in range(B)
)
emit("fixed_8x128_exact", ok=ok)

# --- grouped (prover L/R shape) ---------------------------------------------
gotg = fixed_msm_grouped(fsc, tables, 2)
okg = True
for b in range(B):
    for g in range(2):
        want = host_msm(scal[b][g * 64 : (g + 1) * 64], base_pts[g * 64 : (g + 1) * 64])
        point = ed.to_host(ed.PointArray(*(np.asarray(c)[b, g] for c in gotg)))
        okg = okg and hr.point_equal(point, want)
emit("grouped_8x2x64_exact", ok=okg)

# --- timings ---------------------------------------------------------------
for lanes in (4096, 8192):
    scb = jnp.asarray(pack_ints([(i * 0x9E3779B97F4A7C15 + 1) % hr.L for i in range(lanes)]))
    base = ed.from_host([hr.BASEPOINT])
    ptsb = ed.PointArray(*(jnp.broadcast_to(c, (lanes, 16)) for c in base))
    scb, ptsb = pad_msm_inputs(scb, ptsb)
    t0 = time.perf_counter()
    out = msm_kernel(scb, ptsb)
    out.x.block_until_ready()
    emit(f"dyn_{lanes}_first_s", value=round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = msm_kernel(scb, ptsb)
    out.x.block_until_ready()
    emit(
        f"dyn_{lanes}_ms",
        value=round((time.perf_counter() - t0) / reps * 1e3, 2),
        points_per_sec=round(lanes / ((time.perf_counter() - t0) / reps)),
    )

# fixed-base at the prover's round shape (B=128, S=128, grouped)
B2 = 128
fsc2 = jnp.asarray(
    pack_ints([(i * 0x9E3779B97F4A7C15 + 5) % hr.L for i in range(B2 * S)])
).reshape(B2, S, 16)
out = fixed_msm_grouped(fsc2, tables, 2)
out.x.block_until_ready()
t0 = time.perf_counter()
reps = 5
for _ in range(reps):
    out = fixed_msm_grouped(fsc2, tables, 2)
out.x.block_until_ready()
emit("grouped_128x2x64_ms", value=round((time.perf_counter() - t0) / reps * 1e3, 2))

# --- signed-digit dynamic variant A/B (round-4: halved table build) ---------
from bulletproofs_plus_tpu.ops.pallas_msm import msm_kernel_pallas

for lanes in (4096, 8192):
    scb = jnp.asarray(pack_ints([(i * 0x9E3779B97F4A7C15 + 1) % hr.L for i in range(lanes)]))
    base = ed.from_host([hr.BASEPOINT])
    ptsb = ed.PointArray(*(jnp.broadcast_to(c, (lanes, 16)) for c in base))
    got_u = msm_kernel_pallas(scb, ptsb, signed=False)
    got_s = msm_kernel_pallas(scb, ptsb, signed=True)
    from bulletproofs_plus_tpu.ops import ristretto as rist

    emit(f"signed_{lanes}_exact", ok=bool(rist.point_equal(got_u, got_s)))
    for name, flag in (("unsigned", False), ("signed", True)):
        out = msm_kernel_pallas(scb, ptsb, signed=flag)
        out.x.block_until_ready()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = msm_kernel_pallas(scb, ptsb, signed=flag)
        out.x.block_until_ready()
        emit(
            f"dynvariant_{name}_{lanes}_ms",
            value=round((time.perf_counter() - t0) / reps * 1e3, 2),
        )

# --- pow chain: pallas vs XLA at the verifier decompress width --------------
from bulletproofs_plus_tpu.ops import field as F
from bulletproofs_plus_tpu.ops.pallas_pow import pow_p58_pallas

NPOW = 4864  # 256 proofs x K=19
xs = jnp.asarray(pack_ints([(i * 0x9E3779B97F4A7C15 + 7) % hr.P for i in range(NPOW)]))
xla_chain = jax.jit(lambda v: F.inv25519(v))  # same depth class, pure XLA


@jax.jit
def _pow_pallas_jit(v):
    return pow_p58_pallas(v)


got_pal = _pow_pallas_jit(xs)
got_pal.block_until_ready()
from bulletproofs_plus_tpu.ops.limbs import unpack_ints

check = unpack_ints(np.asarray(got_pal[:4]))
wantp = [pow((i * 0x9E3779B97F4A7C15 + 7) % hr.P, (hr.P - 5) // 8, hr.P) for i in range(4)]
emit("pow_pallas_exact", ok=[g % hr.P for g in check] == wantp)
for name, fn in (("pallas", _pow_pallas_jit), ("xla", xla_chain)):
    out = fn(xs)
    out.block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = fn(xs)
    out.block_until_ready()
    emit(f"pow_{name}_{NPOW}_ms", value=round((time.perf_counter() - t0) / reps * 1e3, 2))
