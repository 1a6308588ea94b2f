"""Generate the pinned golden proof vectors for tests/test_golden_vectors.py.

Runs the HOST oracle (python-int pipeline, no XLA) over a small seeded
matrix — mirroring the reference's seeded-RNG fixture strategy
(/root/reference/tests/ristretto.rs:152-373) — and pins for each cell:

  * the complete serialized proof (hex),
  * the Fiat-Shamir challenges (y, z, per-round e, final e) drawn during
    verification replay,
  * the recovered ExtendedMask blinding factors.

Any regression anywhere in the stack — field ops feeding the host oracle,
transcript framing, serialization, challenge replay — breaks a
milliseconds-cheap test instead of requiring the hour-long compile suite
(round-3 verdict ask #4).  Regenerate ONLY for deliberate protocol changes:
    python scripts/gen_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Host-oracle only — force CPU so a dead TPU tunnel cannot hang generation
# (gens build device-resident tables at init).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

CELLS = [
    # (bits, values, min_values, extension_degree, seed)
    (4, [3], None, 1, 1),
    (16, [1 << 15, 7], None, 1, 2),
    (64, [(1 << 63) + 12345], None, 1, 3),
    (64, [500, 1000], [250, 1000], 1, 4),
    (32, [1 << 20], None, 2, 5),
    (64, [(1 << 40) + 9, 77, 0, 1 << 63], None, 5, 6),
]


def main() -> None:
    from bulletproofs_plus_tpu.ops import host_ristretto as hr
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

    out = []
    for bits, values, min_values, deg, seed in CELLS:
        pc = create_pedersen_gens_with_extension_degree(ExtensionDegree(deg))
        params = RangeParameters.init(bits, len(values), pc)
        rng = SeededRng(seed)
        blindings = [[seed * 1000 + 17 * i + k for k in range(deg)] for i in range(len(values))]
        commitments = [pc.commit(v, bl) for v, bl in zip(values, blindings)]
        mv = min_values if min_values is not None else [None] * len(values)
        # seed_nonce enables deterministic-nonce proving + mask recovery
        # (reference: mask recovery is defined for non-aggregated proofs)
        seed_nonce = (seed * 0xDEADBEEF + 1) if len(values) == 1 else None
        statement = RangeStatement.init(params, commitments, mv, seed_nonce=seed_nonce)
        witness = RangeWitness.init(
            [CommitmentOpening(v, bl) for v, bl in zip(values, blindings)]
        )
        proof = RangeProof.prove_with_rng(Transcript(b"golden"), statement, witness, rng)

        # Challenges exactly as verification replays them
        (challenges, _seeds) = RangeProof._replay_challenges(
            [Transcript(b"golden")], [statement], [proof]
        )
        y, z, es, e = challenges[0]

        masks = RangeProof.verify_batch(
            [Transcript(b"golden")], [statement], [proof],
            VerifyAction.RECOVER_AND_VERIFY, engine="host",
        )
        mask_hex = None
        if masks[0] is not None:
            mask_hex = [format(b, "064x") for b in masks[0].blindings()]

        out.append(
            {
                "bits": bits,
                "values": values,
                "min_values": min_values,
                "extension_degree": deg,
                "seed": seed,
                "blindings": blindings,
                "seed_nonce": seed_nonce,
                "commitments": [hr.compress(c).hex() for c in commitments],
                "proof": proof.to_bytes().hex(),
                "y": format(y, "064x"),
                "z": format(z, "064x"),
                "round_es": [format(v, "064x") for v in es],
                "e": format(e, "064x"),
                "mask": mask_hex,
            }
        )

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "golden")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "golden_vectors.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {len(out)} golden cells")


if __name__ == "__main__":
    main()
