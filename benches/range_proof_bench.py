"""Criterion-style benchmark grid, mirroring the reference's
benches/range_proof.rs:30-323: proof creation (aggregation x bits),
aggregated verification, and batched verification.

Usage: python benches/range_proof_bench.py [--quick]
Prints one human-readable table plus one JSON line per cell.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="small grid")
    parser.add_argument("--engine", default="device", choices=["host", "device"])
    parser.add_argument(
        "--scaling",
        action="store_true",
        help="dp-mesh scaling table (1..N devices); on virtual CPU devices "
        "this validates the mechanism, real speedups need real chips",
    )
    args = parser.parse_args()

    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bulletproofs_plus_tpu import (
        CommitmentOpening,
        ExtensionDegree,
        RangeParameters,
        RangeProof,
        RangeStatement,
        RangeWitness,
        SeededRng,
        Transcript,
        VerifyAction,
        create_pedersen_gens_with_extension_degree,
    )

    aggs = [1, 2] if args.quick else [1, 2, 4, 8]
    bits = [4, 64] if args.quick else [4, 16, 64]
    batches = [2, 8] if args.quick else [1, 4, 16, 64]

    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    rng = SeededRng(8675309)

    def bench(label, fn, iters=3):
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"bench": label, "ms": round(dt * 1000, 2)}))
        return out

    # Proof creation grid (host prover; the batched device prover is
    # benchmarked through the batch cells below)
    for n in bits:
        for m in aggs:
            params = RangeParameters.init(n, m, pc)
            openings = [CommitmentOpening(j + 1, [17 * (j + 1)]) for j in range(m)]
            commitments = [pc.commit(o.v, o.r) for o in openings]
            statement = RangeStatement.init(params, commitments, [None] * m, None)
            witness = RangeWitness.init(openings)
            bench(
                f"prove bits={n} agg={m}",
                lambda: RangeProof.prove_with_rng(Transcript(b"b"), statement, witness, rng),
                iters=1,
            )

    # Verification grids
    for n in bits:
        for m in aggs:
            params = RangeParameters.init(n, m, pc)
            openings = [CommitmentOpening(j + 1, [17 * (j + 1)]) for j in range(m)]
            commitments = [pc.commit(o.v, o.r) for o in openings]
            statement = RangeStatement.init(params, commitments, [None] * m, None)
            witness = RangeWitness.init(openings)
            proof = RangeProof.prove_with_rng(Transcript(b"b"), statement, witness, rng)
            bench(
                f"verify bits={n} agg={m} [{args.engine}]",
                lambda: RangeProof.verify_batch(
                    [Transcript(b"b")], [statement], [proof], VerifyAction.VERIFY_ONLY,
                    engine=args.engine,
                ),
            )

    # Generator creation (benches/generators.rs:21-56 parity):
    # BulletproofGens sizes 2<<{0,3,5,7,9}, PedersenGens degrees {1, 6}
    from bulletproofs_plus_tpu.gens.bulletproof import BulletproofGens

    gen_sizes = [2, 16] if args.quick else [2 << i for i in (0, 3, 5, 7, 9)]
    for size in gen_sizes:
        bench(f"BulletproofGens::new size={size}", lambda: BulletproofGens(size, 1), iters=1)
    for degree in (ExtensionDegree.DEFAULT_PEDERSEN, ExtensionDegree.ADD_FIVE_BASE_POINTS):
        bench(
            f"PedersenGens::with_extension_degree({int(degree)})",
            lambda: create_pedersen_gens_with_extension_degree(degree),
        )

    # Batched verification, 64-bit non-aggregated
    params = RangeParameters.init(64, 1, pc)
    opening = CommitmentOpening(123, [456])
    commitment = pc.commit(opening.v, opening.r)
    statement = RangeStatement.init(params, [commitment], [None], None)
    witness = RangeWitness.init([opening])
    proof = RangeProof.prove_with_rng(Transcript(b"b"), statement, witness, rng)
    for batch in batches:
        bench(
            f"batch-verify bits=64 batch={batch} [{args.engine}]",
            lambda: RangeProof.verify_batch(
                [Transcript(b"b")] * batch, [statement] * batch, [proof] * batch,
                VerifyAction.VERIFY_ONLY, engine=args.engine,
            ),
        )

    # dp-mesh scaling table: batch verification sharded over 1..N devices
    if args.scaling:
        import numpy as np
        from jax.sharding import Mesh

        n_avail = len(jax.devices())
        sc_batch = 8 if args.quick else 32
        sc_bits = 4 if args.quick else 64
        sc_params = RangeParameters.init(sc_bits, 1, pc)
        sc_open = CommitmentOpening(3, [789])
        sc_commit = pc.commit(sc_open.v, sc_open.r)
        sc_statement = RangeStatement.init(sc_params, [sc_commit], [None], None)
        sc_witness = RangeWitness.init([sc_open])
        sc_proof = RangeProof.prove_with_rng(Transcript(b"b"), sc_statement, sc_witness, rng)
        for n_dev in (1, 2, 4, 8):
            if n_dev > n_avail or sc_batch % n_dev:
                continue
            mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("dp",))
            bench(
                f"scaling batch-verify bits={sc_bits} batch={sc_batch} devices={n_dev}",
                lambda: RangeProof.verify_batch(
                    [Transcript(b"b")] * sc_batch,
                    [sc_statement] * sc_batch,
                    [sc_proof] * sc_batch,
                    VerifyAction.VERIFY_ONLY,
                    engine="device",
                    mesh=mesh,
                ),
            )


if __name__ == "__main__":
    main()
