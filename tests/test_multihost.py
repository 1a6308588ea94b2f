"""Pod-scale seams (parallel/multihost.py) on the virtual 8-device mesh.

Single-process here; the multi-host path only adds the jax.distributed
rendezvous on real hardware (initialize_distributed is a documented no-op at
process_count == 1, exercised for idempotence).
"""


import pytest

pytestmark = pytest.mark.compile  # heavy XLA CPU compiles; excluded from the fast tier

import hashlib

import jax
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
    VerificationFailed,
    VerifyAction,
    create_pedersen_gens_with_extension_degree,
)
from bulletproofs_plus_tpu.ops import host_ristretto as hr
from bulletproofs_plus_tpu.parallel import (
    global_dp_mesh,
    host_shard,
    initialize_distributed,
    make_pod_stream,
    verify_stream_pod,
)


def _det(tag: str) -> int:
    return int.from_bytes(hashlib.shake_256(tag.encode()).digest(64), "little") % hr.L


def test_pod_stream_verifies_sharded():
    initialize_distributed()  # no-op single-host, must be safe to call
    assert host_shard(16) == slice(0, 16)  # single process owns everything

    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(4, 1, pc)
    rng = SeededRng(4040)
    statements, proofs = [], []
    for i in range(16):
        v, r = i % 16, _det(f"mh-{i}")
        s = RangeStatement.init(params, [pc.commit(v, [r])], [None], None)
        w = RangeWitness.init([CommitmentOpening(v, [r])])
        proofs.append(RangeProof.prove_with_rng(Transcript(b"mh"), s, w, rng))
        statements.append(s)

    mesh = global_dp_mesh(jax.devices()[:8])
    stream = make_pod_stream(statements, proofs, b"mh", batch_size=8)
    assert len(stream) == 2 and all(len(p) == 8 for _, _, p in stream)
    out = verify_stream_pod(stream, VerifyAction.VERIFY_ONLY, mesh=mesh)
    assert out == [[None] * 8, [None] * 8]

    # A tampered proof anywhere in the stream fails the whole call
    bad = RangeProof.from_bytes(proofs[3].to_bytes())
    bad.r1 = (bad.r1 + 1) % hr.L
    stream = make_pod_stream(statements[:8], proofs[:3] + [bad] + proofs[4:8], b"mh", batch_size=8)
    with pytest.raises(VerificationFailed):
        verify_stream_pod(stream, VerifyAction.VERIFY_ONLY, mesh=mesh)
