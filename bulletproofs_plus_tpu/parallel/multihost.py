"""Multi-host (pod-scale) execution seams.

BASELINE.md's pod-scale configuration is a 64k-proof stream verified across
N >= 2 hosts (the reference has no distributed story at all — its batch
verifier is single-process, range_proof.rs:712-1062; this module is the
TPU-native scale-out of the same folded-MSM check).

Design (single-controller-per-host JAX SPMD):

  * every host calls `initialize_distributed()` once (jax.distributed —
    coordinator rendezvous over DCN), then builds ONE global dp mesh over
    all chips of all hosts;
  * the proof stream is sharded BY HOST at the input layer: each host packs
    only the proofs its local chips verify (`host_shard` selects them), so
    proof bytes never cross DCN;
  * per-batch verification is the existing dp-sharded kernel
    (parallel/verify.py): the cross-device combination is one psum of raw
    uint32 limb accumulators + one 256-byte all_gather of point partials —
    both ride ICI within a host and cross DCN exactly once per batch;
  * the stream pipelines batches exactly like
    `RangeProof.verify_batches_pipelined` (host pack of batch k+1 overlaps
    device folding of batch k).

Only rank 0 returns verdicts for the whole stream (other ranks see their
shard's device arrays; the final identity bit is replicated by the psum).

This module is structured so a single-process run (process_count == 1) is a
degenerate but fully exercised case — that is what the test suite and the
driver dryrun execute; real multi-host runs only add the jax.distributed
rendezvous, which requires hardware this environment does not have.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-host JAX runtime (idempotent; no-op single-host).

    On a pod slice, every host runs the same program with
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set (or
    passes them here); jax.distributed.initialize performs the rendezvous
    and makes `jax.devices()` return the GLOBAL device list.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1:
        return  # single-host: nothing to rendezvous
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_dp_mesh(devices=None):
    """One 1-D data-parallel mesh over every chip of every host."""
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, ("dp",))


def host_shard(n_items: int, mesh=None) -> slice:
    """The contiguous slice of a dp-sharded batch this HOST is responsible
    for packing (inputs are sharded by host so proof bytes never cross DCN).

    With P processes each holding the same local chip count, batch lanes
    split into P contiguous runs in device order.
    """
    import jax

    p = jax.process_count()
    i = jax.process_index()
    per = n_items // p
    assert n_items % p == 0, "batch must divide evenly across hosts"
    return slice(i * per, (i + 1) * per)


def verify_stream_pod(
    batches,
    action,
    mesh=None,
) -> List[list]:
    """Verify a (potentially 64k-proof) stream of batches across all hosts.

    `batches` yields (transcripts, statements, proofs) like
    `RangeProof.verify_batches_pipelined`; each batch's size must divide by
    the global device count.  Single-process: identical to the pipelined
    verifier with a dp mesh.  Multi-process: every host feeds the same
    stream shape; the packing helpers only touch this host's shard.
    """
    from ..models.range_proof import RangeProof

    mesh = mesh if mesh is not None else global_dp_mesh()
    return RangeProof.verify_batches_pipelined(batches, action, mesh=mesh)


def make_pod_stream(
    statements: Sequence,
    proofs: Sequence,
    transcript_label: bytes,
    batch_size: int = 256,
) -> List[Tuple[list, list, list]]:
    """Slice a flat proof list into MAX-sized batches for the pod stream —
    the 64k-proof configuration is `make_pod_stream(..., batch_size=256)`
    (256 batches of 256), fed to `verify_stream_pod`."""
    from ..utils.merlin import Transcript

    out = []
    for lo in range(0, len(proofs), batch_size):
        chunk_s = list(statements[lo : lo + batch_size])
        chunk_p = list(proofs[lo : lo + batch_size])
        out.append(
            ([Transcript(transcript_label) for _ in chunk_p], chunk_s, chunk_p)
        )
    return out
