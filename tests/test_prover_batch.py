"""Batched device prover vs sequential host prover — bit-exact parity.

The batch prover must produce byte-identical proofs to sequential
`prove_with_rng` calls fed the same per-lane RNG streams (the lane view
reconstructs SeededRng's per-lane domain separation).
"""


import pytest

pytestmark = pytest.mark.compile  # heavy XLA CPU compiles; excluded from the fast tier

import hashlib

import numpy as np
import pytest

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
from bulletproofs_plus_tpu.ops import host_ristretto as hr


def _det(tag: str) -> int:
    return int.from_bytes(hashlib.shake_256(tag.encode()).digest(64), "little") % hr.L


class _LaneRng:
    """Single-lane view of SeededRng's per-lane stream (same bytes as lane
    `lane` of a batched SeededRng with the same seed and call sequence)."""

    def __init__(self, seed: int, lane: int):
        self.seed = seed
        self.lane = lane
        self._count = 0

    def fill_bytes(self, batch: int, n: int) -> np.ndarray:
        assert batch == 1
        h = hashlib.shake_256(
            b"bppt-test-rng"
            + self.seed.to_bytes(8, "little")
            + b"%"
            + self._count.to_bytes(8, "little")
            + b"%"
            + self.lane.to_bytes(4, "little")
        )
        self._count += 1
        return np.frombuffer(h.digest(n), dtype=np.uint8).reshape(1, n).copy()


def _setup(seeded: bool, B: int = 2, bit_length: int = 4):
    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(bit_length, 1, pc)
    statements, witnesses = [], []
    for i in range(B):
        v, r = (5 + i) % (1 << bit_length), _det(f"pb-blind-{i}")
        c = pc.commit(v, [r])
        nonce = _det(f"pb-seed-{i}") if seeded else None
        statements.append(RangeStatement.init(params, [c], [None], nonce))
        witnesses.append(RangeWitness.init([CommitmentOpening(v, [r])]))
    return params, statements, witnesses


def _setup_matrix(seeded: bool, bit_length: int, m: int, deg: int, B: int = 2):
    """Aggregated statements with extension degree `deg` and minimum-value
    promises on one slot — the reference prover matrix's hard cells
    (tests/ristretto.rs:24-142)."""
    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree.from_int(deg))
    params = RangeParameters.init(bit_length, m, pc)
    statements, witnesses = [], []
    for i in range(B):
        openings, commitments, promises = [], [], []
        for j in range(m):
            v = ((1 << (bit_length - 1)) + 3 * i + j) % (1 << bit_length)
            blinds = [_det(f"pbm-{i}-{j}-{k}") for k in range(deg)]
            openings.append(CommitmentOpening(v, blinds))
            commitments.append(pc.commit(v, blinds))
            promises.append(min(2, v) if j == 0 else None)  # min-value on slot 0
        nonce = _det(f"pbm-seed-{i}") if seeded else None
        statements.append(RangeStatement.init(params, commitments, promises, nonce))
        witnesses.append(RangeWitness.init(openings))
    return params, statements, witnesses


@pytest.mark.parametrize("seeded", [True, False])
def test_prove_batch_matches_sequential(seeded):
    params, statements, witnesses = _setup(seeded)
    B = len(statements)

    batch_proofs = RangeProof.prove_batch_with_rng(
        [Transcript(b"pb") for _ in range(B)], statements, witnesses, SeededRng(4242)
    )
    for lane in range(B):
        seq = RangeProof.prove_with_rng(
            Transcript(b"pb"), statements[lane], witnesses[lane], _LaneRng(4242, lane)
        )
        assert batch_proofs[lane].to_bytes() == seq.to_bytes()

    # And the batch verifies
    masks = RangeProof.verify_batch(
        [Transcript(b"pb") for _ in range(B)],
        statements,
        batch_proofs,
        VerifyAction.RECOVER_AND_VERIFY if seeded else VerifyAction.VERIFY_ONLY,
    )
    if seeded:
        for mask, witness in zip(masks, witnesses):
            assert mask.blindings() == witness.openings[0].r


@pytest.mark.slow
@pytest.mark.parametrize(
    "seeded,bit_length,m,deg",
    [
        (True, 64, 1, 2),  # flagship bits, extended blinding, min-values
        (False, 8, 2, 2),  # aggregated (seed nonces forbid m>1), unseeded
    ],
)
def test_prove_batch_matrix_matches_sequential(seeded, bit_length, m, deg):
    """Batched-prover bit-exactness beyond the toy shape: aggregation,
    extension degree 2, minimum-value promises, seeded AND unseeded."""
    params, statements, witnesses = _setup_matrix(seeded, bit_length, m, deg)
    B = len(statements)

    batch_transcripts = [Transcript(b"pbm") for _ in range(B)]
    batch_proofs = RangeProof.prove_batch_with_rng(
        batch_transcripts, statements, witnesses, SeededRng(99)
    )
    for lane in range(B):
        seq_t = Transcript(b"pbm")
        seq = RangeProof.prove_with_rng(
            seq_t, statements[lane], witnesses[lane], _LaneRng(99, lane)
        )
        assert batch_proofs[lane].to_bytes() == seq.to_bytes()
        # The caller's transcript advances exactly like the sequential one's
        assert bytes(batch_transcripts[lane].strobe.state.tobytes()) == bytes(
            seq_t.strobe.state.tobytes()
        )
        assert batch_transcripts[lane].strobe.pos == seq_t.strobe.pos

    masks = RangeProof.verify_batch(
        [Transcript(b"pbm") for _ in range(B)],
        statements,
        batch_proofs,
        VerifyAction.RECOVER_AND_VERIFY if seeded else VerifyAction.VERIFY_ONLY,
        engine="device",
    )
    if seeded:
        for mask, witness in zip(masks, witnesses):
            assert mask.blindings() == witness.openings[0].r
