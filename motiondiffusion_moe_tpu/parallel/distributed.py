"""Multi-host (multi-slice) initialization.

The reference's analog is ``dist.init_process_group('nccl', env://)`` +
torchrun environment plumbing (``tools/train.py:88-100``). On TPU pods the
runtime provides coordination; ``jax.distributed.initialize()`` reads it
automatically (GKE/TPU-VM metadata), with explicit args for manual setups.

Per-host responsibilities after init:
- feed each process its shard of the batch: ``DistributedSampler(
  num_replicas=jax.process_count(), rank=jax.process_index())``;
- build the global mesh from ``jax.devices()`` (all processes see all
  devices) — :func:`motiondiffusion_moe_tpu.parallel.make_mesh` already
  does; per-host arrays go global via
  ``multihost_utils.host_local_array_to_global_array`` or
  ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-op when already initialized or
    single-process. Env fallbacks: COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID (the torchrun-env analog of ``tools/train.py:88-90``)."""
    # NOTE: never probe jax.process_count() here — it INSTANTIATES the
    # local backend, after which jax.distributed.initialize() always
    # raises, turning multi-host init into a silent no-op where every
    # host trains the full dataset as process 0 of 1.
    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "0"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", "-1"))
    if coordinator_address and num_processes > 1 and process_id >= 0:
        # explicit multi-process config: failures must PROPAGATE — a
        # degraded "1 of 1" run is silently wrong training, not a
        # fallback
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return
    try:
        # TPU pod / GKE: args are auto-detected from the environment
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process environments (tests, one-chip dev) land here
        pass


def is_primary() -> bool:
    """True on the process that should print/checkpoint (the reference
    patches builtins.print to be master-only, ``tools/train.py:31-43``;
    here callers just guard on this)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> int:
    """Per-process batch size for an evenly-sharded global batch."""
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n
