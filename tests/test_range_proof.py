"""End-to-end prove/verify matrix, mirroring the reference's integration
tests (/root/reference/tests/ristretto.rs:24-373): bit lengths x batch shapes
x extension degrees x minimum-value strategies, plus mask recovery, meddled
statements, and serialization round-trips."""

import enum

import numpy as np
import pytest

from bulletproofs_plus_tpu import (
    CommitmentOpening,
    ExtensionDegree,
    InvalidArgument,
    ProofError,
    RangeParameters,
    RangeProof,
    RangeStatement,
    RangeWitness,
    SeededRng,
    Transcript,
    VerificationFailed,
    VerifyAction,
    create_pedersen_gens_with_extension_degree,
)
from bulletproofs_plus_tpu.ops import host_ristretto as hr


class MinValueStrategy(enum.Enum):
    NO_OFFSET = 0
    INTERMEDIATE = 1
    EQUAL_TO_VALUE = 2
    LARGER_THAN_VALUE = 3


def _make_rng(tag: int) -> SeededRng:
    return SeededRng(8675309 + tag)


def _det_scalar(tag: bytes) -> int:
    import hashlib

    return int.from_bytes(hashlib.shake_256(tag).digest(64), "little") % hr.L


def prove_and_verify(bit_length, batch_shape, extension_degree, strategy, tag=0):
    """One test harness pass, per tests/ristretto.rs:152-373."""
    pc_gens = create_pedersen_gens_with_extension_degree(extension_degree)
    max_agg = max(batch_shape)
    params = RangeParameters.init(bit_length, max_agg, pc_gens)
    rng = _make_rng(tag)

    statements_private = []
    statements_public = []
    proofs = []
    expected_masks = []

    for proof_idx, agg in enumerate(batch_shape):
        openings = []
        commitments = []
        minimum_values = []
        for j in range(agg):
            value = (123 * (proof_idx + 1) + 7 * j) % (1 << bit_length)
            if strategy == MinValueStrategy.NO_OFFSET:
                minimum_values.append(None)
            elif strategy == MinValueStrategy.INTERMEDIATE:
                minimum_values.append(value // 2)
            elif strategy == MinValueStrategy.EQUAL_TO_VALUE:
                minimum_values.append(value)
            else:
                minimum_values.append(value + 1)
            blindings = [
                _det_scalar(f"blind-{tag}-{proof_idx}-{j}-{k}".encode())
                for k in range(int(extension_degree))
            ]
            openings.append(CommitmentOpening(value, blindings))
            commitments.append(pc_gens.commit(value, blindings))

        seed_nonce = _det_scalar(f"seed-{tag}-{proof_idx}".encode()) if agg == 1 else None
        statement_private = RangeStatement.init(params, commitments, minimum_values, seed_nonce)
        statement_public = RangeStatement.init(params, commitments, minimum_values, None)
        witness = RangeWitness.init(openings)

        transcript = Transcript(b"MatrixTest")
        if strategy == MinValueStrategy.LARGER_THAN_VALUE:
            with pytest.raises(InvalidArgument):
                RangeProof.prove_with_rng(transcript, statement_private, witness, rng)
            return

        proof = RangeProof.prove_with_rng(transcript, statement_private, witness, rng)
        statements_private.append(statement_private)
        statements_public.append(statement_public)
        proofs.append(proof)
        expected_masks.append(openings[0].r if agg == 1 else None)

    # RecoverOnly: masks match, no verification
    masks = RangeProof.verify_batch(
        [Transcript(b"MatrixTest") for _ in proofs],
        statements_private,
        proofs,
        VerifyAction.RECOVER_ONLY,
    )
    for mask, expected in zip(masks, expected_masks):
        if expected is None:
            assert mask is None
        else:
            assert mask is not None and mask.blindings() == expected

    # RecoverAndVerify
    masks = RangeProof.verify_batch(
        [Transcript(b"MatrixTest") for _ in proofs],
        statements_private,
        proofs,
        VerifyAction.RECOVER_AND_VERIFY,
    )
    for mask, expected in zip(masks, expected_masks):
        if expected is None:
            assert mask is None
        else:
            assert mask is not None and mask.blindings() == expected

    # VerifyOnly as a public entity: no masks
    masks = RangeProof.verify_batch(
        [Transcript(b"MatrixTest") for _ in proofs],
        statements_public,
        proofs,
        VerifyAction.VERIFY_ONLY,
    )
    assert all(m is None for m in masks)

    # Serialization round-trip
    for proof in proofs:
        data = proof.to_bytes()
        assert RangeProof.from_bytes(data) == proof
        assert len(data) == 1 + 32 * (int(extension_degree) + 5 + len(proof.li) + len(proof.ri))

    # Wrong seed nonce recovers a wrong mask (tests/ristretto.rs:291-318)
    if any(a == 1 for a in batch_shape):
        idx = next(i for i, a in enumerate(batch_shape) if a == 1)
        bad_statement = RangeStatement.init(
            params,
            statements_private[idx].commitments,
            statements_private[idx].minimum_value_promises,
            _det_scalar(b"wrong-seed"),
        )
        bad = RangeProof.verify_batch(
            [Transcript(b"MatrixTest")], [bad_statement], [proofs[idx]], VerifyAction.RECOVER_ONLY
        )
        assert bad[0] is not None and bad[0].blindings() != expected_masks[idx]

    # Meddled minimum-value promises must fail verification (tests/ristretto.rs:320-356)
    meddled_promises = list(statements_public[0].minimum_value_promises)
    meddled_promises[0] = (meddled_promises[0] or 0) + 1
    if bit_length >= (meddled_promises[0]).bit_length():
        meddled = RangeStatement.init(
            params, statements_public[0].commitments, meddled_promises, None
        )
        with pytest.raises(VerificationFailed):
            RangeProof.verify_batch(
                [Transcript(b"MatrixTest") for _ in proofs],
                [meddled] + statements_public[1:],
                proofs,
                VerifyAction.VERIFY_ONLY,
            )


MATRIX = [
    (4, [1], ExtensionDegree.DEFAULT_PEDERSEN, MinValueStrategy.NO_OFFSET),
    (4, [1, 1], ExtensionDegree.DEFAULT_PEDERSEN, MinValueStrategy.INTERMEDIATE),
    (4, [2], ExtensionDegree.ADD_ONE_BASE_POINT, MinValueStrategy.EQUAL_TO_VALUE),
    (4, [1], ExtensionDegree.DEFAULT_PEDERSEN, MinValueStrategy.LARGER_THAN_VALUE),
    (8, [1, 2], ExtensionDegree.DEFAULT_PEDERSEN, MinValueStrategy.NO_OFFSET),
    (8, [4], ExtensionDegree.ADD_FIVE_BASE_POINTS, MinValueStrategy.INTERMEDIATE),
    (16, [1], ExtensionDegree.ADD_TWO_BASE_POINTS, MinValueStrategy.NO_OFFSET),
    (32, [1], ExtensionDegree.ADD_THREE_BASE_POINTS, MinValueStrategy.INTERMEDIATE),
    (32, [2], ExtensionDegree.ADD_FOUR_BASE_POINTS, MinValueStrategy.NO_OFFSET),
    (64, [1], ExtensionDegree.DEFAULT_PEDERSEN, MinValueStrategy.NO_OFFSET),
    (64, [2, 1], ExtensionDegree.DEFAULT_PEDERSEN, MinValueStrategy.INTERMEDIATE),
]


@pytest.mark.parametrize("bit_length,batch,degree,strategy", MATRIX)
def test_matrix(bit_length, batch, degree, strategy):
    prove_and_verify(bit_length, batch, degree, strategy, tag=bit_length * 1000 + len(batch))


def test_byte_meddling_fails():
    """Flipping ANY proof byte must break verification or parsing —
    every position, stride 1, like range_proof.rs:1400-1434."""
    pc_gens = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(4, 1, pc_gens)
    value, blinding = 5, _det_scalar(b"meddle-blind")
    commitment = pc_gens.commit(value, [blinding])
    statement = RangeStatement.init(params, [commitment], [None], None)
    witness = RangeWitness.init([CommitmentOpening(value, [blinding])])
    proof = RangeProof.prove_with_rng(Transcript(b"Meddle"), statement, witness, _make_rng(1))
    data = bytearray(proof.to_bytes())

    verify_failures = 0
    for pos in range(len(data)):
        meddled = bytearray(data)
        meddled[pos] ^= 1
        try:
            bad = RangeProof.from_bytes(bytes(meddled))
        except ProofError:
            continue
        with pytest.raises(ProofError):
            RangeProof.verify_batch(
                [Transcript(b"Meddle")], [statement], [bad], VerifyAction.VERIFY_ONLY
            )
        verify_failures += 1
    # Some meddled proofs must still parse (and then fail verification),
    # or the sweep never exercised the verifier at all
    assert verify_failures > 0


def test_from_bytes_rejects_truncation_and_extension():
    """Byte-level canonicality sweep (range_proof.rs:1339-1435 parity):
    a minimal proof rejects every truncation; appended zeros only parse when
    they form whole extra (L, R) pairs."""
    identity = bytes(32)
    zero_scalar = bytes(32)
    minimal = RangeProof(
        a=identity,
        a1=identity,
        b=identity,
        r1=0,
        s1=0,
        d1=[0] * 6,
        li=[identity],
        ri=[identity],
        extension_degree=ExtensionDegree.ADD_FIVE_BASE_POINTS,
    )
    data = minimal.to_bytes()
    assert RangeProof.from_bytes(data) == minimal
    assert RangeProof.extension_degree_from_proof_bytes(data) == ExtensionDegree.ADD_FIVE_BASE_POINTS

    # Empty / too-short inputs
    with pytest.raises(ProofError):
        RangeProof.from_bytes(b"")
    with pytest.raises(ProofError):
        RangeProof.from_bytes(zero_scalar)

    # Empty L/R is rejected even if well-formed otherwise
    empty_lr = bytes([1]) + zero_scalar * 6
    with pytest.raises(ProofError):
        RangeProof.from_bytes(empty_lr)

    # Invalid extension degree byte
    with pytest.raises(ProofError):
        RangeProof.from_bytes(bytes([0]) + data[1:])
    with pytest.raises(ProofError):
        RangeProof.from_bytes(bytes([7]) + data[1:])

    # Every truncation of a minimal proof fails
    for cut in range(0, len(data)):
        with pytest.raises(ProofError):
            RangeProof.from_bytes(data[:cut])

    # Extension only parses when whole (L, R) pairs (64 B) are added
    extended = bytearray(data)
    for i in range(256):
        extended.append(0)
        if (i + 1) % 64 == 0:
            RangeProof.from_bytes(bytes(extended))
        else:
            with pytest.raises(ProofError):
                RangeProof.from_bytes(bytes(extended))


def test_verify_batch_argument_errors():
    pc_gens = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(4, 1, pc_gens)
    value, blinding = 3, 778
    commitment = pc_gens.commit(value, [blinding])
    statement = RangeStatement.init(params, [commitment], [None], None)
    witness = RangeWitness.init([CommitmentOpening(value, [blinding])])
    proof = RangeProof.prove_with_rng(Transcript(b"Args"), statement, witness, _make_rng(3))

    with pytest.raises(InvalidArgument):
        RangeProof.verify_batch([], [], [], VerifyAction.VERIFY_ONLY)
    with pytest.raises(InvalidArgument):
        RangeProof.verify_batch([Transcript(b"Args")], [statement, statement], [proof], VerifyAction.VERIFY_ONLY)
    with pytest.raises(InvalidArgument):
        RangeProof.verify_batch(
            [Transcript(b"Args"), Transcript(b"Args")], [statement], [proof], VerifyAction.VERIFY_ONLY
        )


def test_prover_consistency_errors():
    """Prover-side consistency matrix (range_proof.rs:1672-1756 analog)."""
    pc_gens = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(4, 2, pc_gens)
    value, blinding = 3, 779
    commitment = pc_gens.commit(value, [blinding])
    statement = RangeStatement.init(params, [commitment], [None], None)

    # Openings/commitments count mismatch
    witness2 = RangeWitness.init([CommitmentOpening(1, [1]), CommitmentOpening(2, [2])])
    with pytest.raises(ProofError):
        RangeProof.prove_with_rng(Transcript(b"C"), statement, witness2, _make_rng(4))

    # Extension degree mismatch
    pc2 = create_pedersen_gens_with_extension_degree(ExtensionDegree.ADD_ONE_BASE_POINT)
    witness_deg2 = RangeWitness.init([CommitmentOpening(value, [1, 2])])
    with pytest.raises(ProofError):
        RangeProof.prove_with_rng(Transcript(b"C"), statement, witness_deg2, _make_rng(5))

    # Value exceeds bit capacity
    witness_big = RangeWitness.init([CommitmentOpening(300, [blinding])])
    with pytest.raises(ProofError):
        RangeProof.prove_with_rng(Transcript(b"C"), statement, witness_big, _make_rng(6))

    # Invalid opening
    witness_bad = RangeWitness.init([CommitmentOpening(value, [blinding + 1])])
    with pytest.raises(InvalidArgument):
        RangeProof.prove_with_rng(Transcript(b"C"), statement, witness_bad, _make_rng(7))


def test_statement_init_errors():
    pc_gens = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(64, 2, pc_gens)
    p = hr.BASEPOINT

    with pytest.raises(InvalidArgument):
        RangeStatement.init(params, [p] * 3, [None] * 3, None)
    with pytest.raises(InvalidArgument):
        RangeStatement.init(params, [p] * 2, [None], None)
    with pytest.raises(InvalidArgument):
        RangeStatement.init(params, [p] * 4, [None] * 4, None)
    with pytest.raises(InvalidArgument):
        RangeStatement.init(params, [p] * 2, [None] * 2, 1)


def test_params_init_errors():
    pc_gens = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    with pytest.raises(InvalidArgument):
        RangeParameters.init(64, 3, pc_gens)
    with pytest.raises(InvalidArgument):
        RangeParameters.init(3, 4, pc_gens)
    with pytest.raises(InvalidArgument):
        RangeParameters.init(128, 4, pc_gens)
