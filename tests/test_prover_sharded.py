"""dp-sharded batched prover: identical proof bytes at 1, 2, and 8 devices.

The prover's device kernels are batch-parallel, so sharding the lane axis
over a mesh must be a pure partitioning with no effect on results.
"""


import pytest

pytestmark = pytest.mark.compile  # heavy XLA CPU compiles; excluded from the fast tier

import hashlib

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

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


def _setup(B: int):
    pc = create_pedersen_gens_with_extension_degree(ExtensionDegree.DEFAULT_PEDERSEN)
    params = RangeParameters.init(4, 1, pc)
    statements, witnesses = [], []
    for i in range(B):
        v, r = i % 16, _det(f"shp-{i}")
        statements.append(RangeStatement.init(params, [pc.commit(v, [r])], [None], None))
        witnesses.append(RangeWitness.init([CommitmentOpening(v, [r])]))
    return statements, witnesses


def _prove(statements, witnesses, mesh):
    return RangeProof.prove_batch_with_rng(
        [Transcript(b"shp") for _ in statements],
        statements,
        witnesses,
        SeededRng(2024),
        mesh=mesh,
    )


def test_sharded_prover_matches_unsharded():
    B = 8
    statements, witnesses = _setup(B)
    base = [p.to_bytes() for p in _prove(statements, witnesses, None)]
    for n_dev in (2, 8):
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("dp",))
        got = [p.to_bytes() for p in _prove(statements, witnesses, mesh)]
        assert got == base, f"sharded prover diverged at {n_dev} devices"

    # And the sharded proofs verify
    masks = RangeProof.verify_batch(
        [Transcript(b"shp") for _ in statements],
        statements,
        [RangeProof.from_bytes(b) for b in base],
        VerifyAction.VERIFY_ONLY,
        engine="device",
    )
    assert masks == [None] * B
