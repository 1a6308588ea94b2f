"""Pinned end-to-end golden vectors — the milliseconds-cheap regression
anchor for the whole host pipeline (round-3 verdict ask #4).

Each cell of tests/golden/golden_vectors.json (generated once by
scripts/gen_golden.py, host oracle only) pins the complete serialized proof,
the replayed Fiat-Shamir challenges, and the recovered mask for a seeded
statement.  Any change to field arithmetic, transcript framing, nonce
derivation, serialization, or challenge replay flips a byte here — in
milliseconds, without XLA compiles — mirroring the reference's seeded-RNG
fixture strategy (/root/reference/tests/ristretto.rs:152-373).
"""

import json
import os

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

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "golden_vectors.json")

with open(GOLDEN) as f:
    CELLS = json.load(f)


def _rebuild(cell):
    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree(cell["extension_degree"]))
    params = RangeParameters.init(cell["bits"], len(cell["values"]), pc)
    commitments = [pc.commit(v, bl) for v, bl in zip(cell["values"], cell["blindings"])]
    mv = cell["min_values"] if cell["min_values"] is not None else [None] * len(cell["values"])
    statement = RangeStatement.init(params, commitments, mv, seed_nonce=cell["seed_nonce"])
    witness = RangeWitness.init(
        [CommitmentOpening(v, bl) for v, bl in zip(cell["values"], cell["blindings"])]
    )
    return pc, statement, witness, commitments


@pytest.mark.parametrize("cell", CELLS, ids=[f"b{c['bits']}m{len(c['values'])}d{c['extension_degree']}" for c in CELLS])
def test_golden_prove_bytes(cell):
    """Re-prove with the pinned seed: the proof must be byte-identical."""
    _pc, statement, witness, commitments = _rebuild(cell)
    assert [hr.compress(c).hex() for c in commitments] == cell["commitments"]
    proof = RangeProof.prove_with_rng(
        Transcript(b"golden"), statement, witness, SeededRng(cell["seed"])
    )
    assert proof.to_bytes().hex() == cell["proof"]


@pytest.mark.parametrize("cell", CELLS, ids=[f"b{c['bits']}m{len(c['values'])}d{c['extension_degree']}" for c in CELLS])
def test_golden_challenges_and_verify(cell):
    """Deserialize the pinned bytes, replay challenges, verify, recover."""
    _pc, statement, _witness, _ = _rebuild(cell)
    proof = RangeProof.from_bytes(bytes.fromhex(cell["proof"]))
    assert proof.to_bytes().hex() == cell["proof"]  # canonical round-trip

    (challenges, _seeds) = RangeProof._replay_challenges(
        [Transcript(b"golden")], [statement], [proof]
    )
    y, z, es, e = challenges[0]
    assert format(y, "064x") == cell["y"]
    assert format(z, "064x") == cell["z"]
    assert [format(v, "064x") for v in es] == cell["round_es"]
    assert format(e, "064x") == cell["e"]

    masks = RangeProof.verify_batch(
        [Transcript(b"golden")], [statement], [proof],
        VerifyAction.RECOVER_AND_VERIFY, engine="host",
    )
    if cell["mask"] is None:
        assert masks[0] is None
    else:
        assert [format(b, "064x") for b in masks[0].blindings()] == cell["mask"]


def test_golden_tamper_rejected():
    """Flipping any single proof byte must fail verification or parsing."""
    from bulletproofs_plus_tpu.errors import ProofError

    cell = CELLS[0]
    _pc, statement, _witness, _ = _rebuild(cell)
    raw = bytearray(bytes.fromhex(cell["proof"]))
    for pos in range(0, len(raw), 37):  # stride keeps it fast; covers all sections
        tampered = bytearray(raw)
        tampered[pos] ^= 1
        try:
            proof = RangeProof.from_bytes(bytes(tampered))
            RangeProof.verify_batch(
                [Transcript(b"golden")], [statement], [proof],
                VerifyAction.VERIFY_ONLY, engine="host",
            )
        except ProofError:
            continue
        raise AssertionError(f"tampered byte {pos} accepted")
