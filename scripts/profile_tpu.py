"""On-device profiling harness: per-op device-time breakdown of the hot
kernels on the real TPU (or CPU with --cpu).

Wall-clock through the axon tunnel measures ~28 ms of readback latency, not
kernels (CLAUDE.md "tunnel economics"), so this uses jax.profiler traces and
aggregates XLA op time from the trace protos.  Run:

    python scripts/profile_tpu.py [verify|msm|prove|all]

Prints one JSON line per kernel: total device ms + top-10 op fusions.
This is the in-repo tracing/profiling subsystem (SURVEY.md §5) — bench.py
reports throughput, this reports where the device time goes.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
import time


def _setup(cpu: bool) -> None:
    import resource

    try:
        resource.setrlimit(resource.RLIMIT_STACK, (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
    except (ValueError, OSError):
        pass
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import sys

    sys.path.insert(0, repo)
    from bulletproofs_plus_tpu.utils.envcache import enable_compile_cache

    enable_compile_cache(cpu=cpu)


def _device_events(trace_dir: str):
    """Aggregate (op_name -> device ns) from the trace's trace.json.gz."""
    events: dict = {}
    total = 0
    for path in glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    ):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        # Device lanes are pids whose process name contains "TPU" / "Device"
        device_pids = set()
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                name = ev.get("args", {}).get("name", "")
                if "TPU" in name or "Device" in name or "/device:" in name:
                    device_pids.add(ev.get("pid"))
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("pid") in device_pids:
                dur = ev.get("dur", 0)  # microseconds
                name = ev.get("name", "?")
                events[name] = events.get(name, 0) + dur
                total += dur
    return total, events


def profile_call(tag: str, fn, *args, iters: int = 3):
    """Trace `fn(*args)` and print a device-time breakdown JSON line."""
    import jax

    fn(*args)  # warm/compile outside the trace
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
        total_us, events = _device_events(td)
    top = sorted(events.items(), key=lambda kv: -kv[1])[:12]
    print(
        json.dumps(
            {
                "kernel": tag,
                "device_ms_per_iter": round(total_us / 1e3 / iters, 3),
                "top_ops": [
                    {"op": k[:80], "ms_per_iter": round(v / 1e3 / iters, 3)}
                    for k, v in top
                ],
            }
        ),
        flush=True,
    )


def _bench_fixtures(bits=64, batch=256):
    from bulletproofs_plus_tpu import (
        CommitmentOpening,
        ExtensionDegree,
        RangeParameters,
        RangeProof,
        RangeStatement,
        RangeWitness,
        SeededRng,
        Transcript,
        create_pedersen_gens_with_extension_degree,
    )

    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(bits, 1, pc)
    rng = SeededRng(123)
    statements, witnesses, proofs = [], [], []
    for i in range(4):
        v, b = (1 << (bits - 1)) + i, 424242 + i
        c = pc.commit(v, [b])
        s = RangeStatement.init(params, [c], [None], None)
        w = RangeWitness.init([CommitmentOpening(v, [b])])
        proofs.append(RangeProof.prove_with_rng(Transcript(b"prof"), s, w, rng))
        statements.append(s)
        witnesses.append(w)
    statements = [statements[i % 4] for i in range(batch)]
    proofs = [proofs[i % 4] for i in range(batch)]
    return pc, params, statements, witnesses, proofs


def profile_verify(batch=256):
    import jax.numpy as jnp
    import numpy as np

    from bulletproofs_plus_tpu import Transcript
    from bulletproofs_plus_tpu.models.range_proof import RangeProof as RP
    from bulletproofs_plus_tpu.models.replay_device import pack_replay_inputs, replay_fn
    from bulletproofs_plus_tpu.models.verifier_kernels import verify_group_bytes
    from bulletproofs_plus_tpu.ops.limbs import pack_ints

    pc, params, statements, witnesses, proofs = _bench_fixtures(batch=batch)
    gens = statements[0].generators
    bits = gens.bit_length()
    rounds = len(proofs[0].li)
    stacked = Transcript.stack([Transcript(b"prof") for _ in proofs])
    buf = jnp.asarray(pack_replay_inputs(statements, proofs))
    rep = replay_fn(
        gens.h_base_compressed(), tuple(gens.g_bases_compressed()), bits, 1, 1,
        rounds, stacked.strobe.pos, stacked.strobe.pos_begin, stacked.strobe.cur_flags,
    )
    state = jnp.asarray(stacked.strobe.state)
    profile_call("replay_kernel", rep, state, buf)

    y, z, es, e, seeds, _, _ = rep(state, buf)
    weights = RP._draw_weights([row.tobytes() for row in np.asarray(seeds)], len(proofs))
    w_dev = jnp.asarray(pack_ints(weights))
    tables_ = gens.bp_gens.fixed_tables_sliced(2 * bits)
    g_base_pts, h_base_pt = gens.pc_gens.device_bases()

    def fused(y, z, es, e, w_dev, buf):
        return verify_group_bytes(
            y, z, es, e, w_dev, buf, tables_, g_base_pts, h_base_pt,
            m=1, bit_length=bits, extension_degree=1, max_mn=bits,
        )

    profile_call("fused_verify_kernel", fused, y, z, es, e, w_dev, buf)


def profile_msm(lanes=4096):
    import jax.numpy as jnp

    from bulletproofs_plus_tpu.ops import edwards as ed
    from bulletproofs_plus_tpu.ops import host_ristretto as hr
    from bulletproofs_plus_tpu.ops.limbs import pack_ints
    from bulletproofs_plus_tpu.ops.msm import msm_kernel, pad_msm_inputs

    sc = jnp.asarray(pack_ints([(i * 0x9E3779B97F4A7C15 + 1) % hr.L for i in range(lanes)]))
    base = ed.from_host([hr.BASEPOINT])
    pts = ed.PointArray(*(jnp.broadcast_to(c, (lanes, 16)) for c in base))
    sc, pts = pad_msm_inputs(sc, pts)
    profile_call(f"msm_dynamic_{lanes}", msm_kernel, sc, pts)


def profile_prove(batch=32, bits=64):
    from bulletproofs_plus_tpu import RangeProof, SeededRng, Transcript

    pc, params, statements, witnesses, _ = _bench_fixtures(bits=bits, batch=batch)
    witnesses = [witnesses[i % 4] for i in range(batch)]

    def run():
        return RangeProof.prove_batch_with_rng(
            [Transcript(b"prof") for _ in range(batch)],
            statements[:batch], witnesses, SeededRng(7),
        )

    t0 = time.perf_counter()
    run()
    print(json.dumps({"kernel": "prove_compile+first_run_s", "value": round(time.perf_counter() - t0, 1)}), flush=True)
    import jax

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            run()
        total_us, events = _device_events(td)
    top = sorted(events.items(), key=lambda kv: -kv[1])[:12]
    print(
        json.dumps(
            {
                "kernel": f"prove_batch_{batch}",
                "device_ms": round(total_us / 1e3, 3),
                "top_ops": [
                    {"op": k[:80], "ms": round(v / 1e3, 3)} for k, v in top
                ],
            }
        ),
        flush=True,
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    _setup(cpu="--cpu" in sys.argv)
    if which in ("verify", "all"):
        profile_verify()
    if which in ("msm", "all"):
        profile_msm()
    if which in ("prove", "all"):
        profile_prove()


if __name__ == "__main__":
    main()
