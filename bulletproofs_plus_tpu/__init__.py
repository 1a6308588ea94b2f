"""bulletproofs_plus_tpu — a TPU-native Bulletproofs+ range-proof framework.

A from-scratch JAX/XLA/Pallas implementation of the Bulletproofs+ zero
knowledge range-proof system over the ristretto255 group, with the same
capabilities as the reference Rust library `tari_bulletproofs_plus` v0.4.1:

  * range proving for commitments to values in [0, 2^n), n ≤ 64
  * proof aggregation (one proof over m commitments)
  * extended commitments (1–6 blinding factors)
  * minimum-value promises
  * batch verification folding many proofs into one multiscalar multiplication
  * mask extraction ("rewinding") via shared seed nonces
  * canonical serialization

Architecture (TPU-first, not a port):
  * batch and vector-length are array axes everywhere — even Fiat-Shamir
    transcripts advance as a numpy-vectorised batch of STROBE sponges
  * all group/field math runs as jitted limb-vector kernels (uint32 limbs)
  * batch verification is one fused scalar pipeline plus one large MSM,
    shardable across a `jax.sharding.Mesh` with psum bucket reduction
"""

from .errors import (
    InvalidArgument,
    InvalidBlake2b,
    InvalidLength,
    ProofError,
    SizeOverflow,
    VerificationFailed,
)
from .gens import (
    BulletproofGens,
    ExtensionDegree,
    PedersenGens,
    RangeParameters,
    create_pedersen_gens_with_extension_degree,
)
from .models import (
    CommitmentOpening,
    ExtendedMask,
    RangeProof,
    RangeStatement,
    RangeWitness,
    VerifyAction,
)
from .utils.merlin import NullRng, OsRng, SeededRng, Transcript

__version__ = "0.1.0"

__all__ = [
    "BulletproofGens",
    "CommitmentOpening",
    "ExtendedMask",
    "ExtensionDegree",
    "InvalidArgument",
    "InvalidBlake2b",
    "InvalidLength",
    "NullRng",
    "OsRng",
    "PedersenGens",
    "ProofError",
    "RangeParameters",
    "RangeProof",
    "RangeStatement",
    "RangeWitness",
    "SeededRng",
    "SizeOverflow",
    "Transcript",
    "VerificationFailed",
    "VerifyAction",
    "create_pedersen_gens_with_extension_degree",
]
