"""Benchmark: batched verification throughput of 64-bit range proofs.

Prints ONE JSON line:
  {"metric": "batch_verify_64bit_proofs_per_sec", "value": N,
   "unit": "proofs/s", "vs_baseline": N/1000}

Baseline (BASELINE.json north star): >= 1000 aggregated 64-bit proofs/s
batch-verified on a TPU v5e-16 slice; this benchmark runs on however many
chips are visible (typically one) with the device verification engine
(host Fiat-Shamir replay + jitted scalar pass + folded MSM ladder).
"""

from __future__ import annotations

import json
import time

BASELINE_PROOFS_PER_SEC = 1000.0


def main() -> None:
    import os

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

    BIT_LENGTH = 64
    DISTINCT = 4
    BATCH = 256

    pc_gens = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(BIT_LENGTH, 1, pc_gens)
    rng = SeededRng(8675309)

    statements = []
    proofs = []
    for i in range(DISTINCT):
        value = (1 << 63) + 1017 * i
        blinding = 987654321 + i
        commitment = pc_gens.commit(value, [blinding])
        statement = RangeStatement.init(params, [commitment], [None], None)
        witness = RangeWitness.init([CommitmentOpening(value, [blinding])])
        proofs.append(RangeProof.prove_with_rng(Transcript(b"bench"), statement, witness, rng))
        statements.append(statement)

    # Tile to the full batch (verification weights still differ per slot)
    statements = [statements[i % DISTINCT] for i in range(BATCH)]
    proofs = [proofs[i % DISTINCT] for i in range(BATCH)]

    def run():
        return RangeProof.verify_batch(
            [Transcript(b"bench") for _ in range(BATCH)],
            statements,
            proofs,
            VerifyAction.VERIFY_ONLY,
            engine="device",
        )

    run()  # warmup/compile

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    elapsed = time.perf_counter() - t0

    proofs_per_sec = BATCH * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "batch_verify_64bit_proofs_per_sec",
                "value": round(proofs_per_sec, 2),
                "unit": "proofs/s",
                "vs_baseline": round(proofs_per_sec / BASELINE_PROOFS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
