"""`verify_batches_pipelined` — the headline streaming API.

Covers the pipeline seams the single-batch tests cannot: result ordering
across batches, lowest-index failure propagation with later batches in
flight, RECOVER_AND_VERIFY mask parity with the unpipelined path, a
mixed-shape stream (different kernels per batch AND a multi-group batch),
and the reference's 256-proof batch cap (range_proof.rs:740-749).

One tiny proof shape (4-bit) keeps XLA CPU compiles shared with the other
device tests.
"""


import pytest

pytestmark = pytest.mark.compile  # heavy XLA CPU compiles; excluded from the fast tier

import hashlib

import pytest

from bulletproofs_plus_tpu import (
    CommitmentOpening,
    ExtensionDegree,
    InvalidArgument,
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


def _det(tag: str) -> int:
    return int.from_bytes(hashlib.shake_256(tag.encode()).digest(64), "little") % hr.L


@pytest.fixture(scope="module")
def stream():
    """Three 4-bit seeded batches of sizes 2, 1, 3 with distinct values."""
    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(4, 1, pc)
    rng = SeededRng(555)
    batches = []
    k = 0
    for size in (2, 1, 3):
        statements, witnesses, proofs = [], [], []
        for _ in range(size):
            v, r = k % 16, _det(f"pl-blind-{k}")
            c = pc.commit(v, [r])
            s = RangeStatement.init(params, [c], [None], _det(f"pl-seed-{k}"))
            w = RangeWitness.init([CommitmentOpening(v, [r])])
            proofs.append(RangeProof.prove_with_rng(Transcript(b"pl"), s, w, rng))
            statements.append(s)
            witnesses.append(w)
            k += 1
        batches.append((statements, witnesses, proofs))
    return pc, params, batches


def _ts(n):
    return [Transcript(b"pl") for _ in range(n)]


def test_pipelined_matches_unpipelined_in_order(stream):
    pc, params, batches = stream
    out = RangeProof.verify_batches_pipelined(
        [(_ts(len(p)), s, p) for s, w, p in batches],
        VerifyAction.RECOVER_AND_VERIFY,
    )
    assert len(out) == len(batches)
    for masks, (statements, witnesses, proofs) in zip(out, batches):
        ref = RangeProof.verify_batch(
            _ts(len(proofs)), statements, proofs,
            VerifyAction.RECOVER_AND_VERIFY, engine="device",
        )
        assert masks == ref
        for mask, w in zip(masks, witnesses):
            assert mask.blindings() == w.openings[0].r


def test_pipelined_first_failure_wins(stream):
    """A device-detected failure in an EARLY batch must be the one raised,
    even though a later batch's stages run first in the interleave — and a
    tampered LATER batch must not mask earlier successes."""
    pc, params, batches = stream
    (s0, w0, p0), (s1, w1, p1), (s2, w2, p2) = batches

    bad1 = RangeProof.from_bytes(p1[0].to_bytes())
    bad1.r1 = (bad1.r1 + 1) % hr.L
    with pytest.raises(VerificationFailed):
        RangeProof.verify_batches_pipelined(
            [(_ts(2), s0, p0), (_ts(1), s1, [bad1]), (_ts(3), s2, p2)],
            VerifyAction.VERIFY_ONLY,
        )

    # Structural error in a LATER batch (length mismatch raises at dispatch,
    # before earlier batches' verdicts) must not shadow an earlier batch's
    # verification failure.
    bad0 = RangeProof.from_bytes(p0[0].to_bytes())
    bad0.s1 = (bad0.s1 + 1) % hr.L
    with pytest.raises(VerificationFailed):
        RangeProof.verify_batches_pipelined(
            [(_ts(2), s0, [bad0, p0[1]]), (_ts(1), s1, []), (_ts(3), s2, p2)],
            VerifyAction.VERIFY_ONLY,
        )

    # And the dispatch-time error alone does raise (as InvalidArgument)
    with pytest.raises(InvalidArgument):
        RangeProof.verify_batches_pipelined(
            [(_ts(2), s0, p0), (_ts(1), s1, [])],
            VerifyAction.VERIFY_ONLY,
        )


def test_pipelined_mixed_shape_stream(stream):
    """Batches of different shapes (m=1 fast path, then an m=2+m=1 multi-
    group batch) flow through one pipelined call."""
    pc, params, batches = stream
    (s0, w0, p0) = batches[0]

    params2 = RangeParameters.init(4, 2, pc)
    rng = SeededRng(777)
    vals, blinds = [3, 12], [[_det("plm-a")], [_det("plm-b")]]
    cs = [pc.commit(v, b) for v, b in zip(vals, blinds)]
    s_agg = RangeStatement.init(params2, cs, [None, None], None)
    w_agg = RangeWitness.init([CommitmentOpening(v, b) for v, b in zip(vals, blinds)])
    p_agg = RangeProof.prove_with_rng(Transcript(b"pl"), s_agg, w_agg, rng)

    # Second batch mixes shapes INSIDE the batch -> multi-group device path
    out = RangeProof.verify_batches_pipelined(
        [
            (_ts(2), s0, p0),
            (_ts(2), [s_agg, s0[0]], [p_agg, p0[0]]),
        ],
        VerifyAction.VERIFY_ONLY,
    )
    assert out == [[None, None], [None, None]]


@pytest.mark.slow
def test_pipelined_batch_cap_256(stream):
    """Proofs beyond MAX_RANGE_PROOF_BATCH_SIZE=256 are silently ignored and
    contribute no masks (range_proof.rs:740-749 parity) — even an INVALID
    proof in position 257 must be ignored."""
    pc, params, batches = stream
    (s0, w0, p0) = batches[0]
    bad = RangeProof.from_bytes(p0[0].to_bytes())
    bad.r1 = (bad.r1 + 1) % hr.L

    statements = [s0[0]] * 257
    proofs = [p0[0]] * 256 + [bad]
    (out,) = RangeProof.verify_batches_pipelined(
        [(_ts(257), statements, proofs)], VerifyAction.VERIFY_ONLY
    )
    assert out == [None] * 256
