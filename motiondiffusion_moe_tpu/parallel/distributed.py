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
from typing import Optional, Sequence

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids: Optional[Sequence[int]] = None,
                           ) -> None:
    """Initialize multi-host JAX. No-op when already initialized or
    single-process. Env fallbacks: COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID / LOCAL_DEVICE_IDS (the torchrun-env analog of
    ``tools/train.py:88-90``). ``local_device_ids`` (comma-list in the env
    var) is only needed for manual launches that pin a device subset per
    process — e.g. the 2-process CPU-mesh tests; TPU pods auto-detect."""
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
    if local_device_ids is None:
        env_ids = os.environ.get("LOCAL_DEVICE_IDS", "")
        if env_ids:
            local_device_ids = [int(x) for x in env_ids.split(",")]
    if coordinator_address and num_processes > 1 and process_id >= 0:
        # explicit multi-process config: failures must PROPAGATE — a
        # degraded "1 of 1" run is silently wrong training, not a
        # fallback
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
        _use_coordination_service_barriers()
        return
    try:
        # TPU pod / GKE: args are auto-detected from the environment
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process environments (tests, one-chip dev) land here
        return
    _use_coordination_service_barriers()


def _use_coordination_service_barriers() -> None:
    """Route orbax barriers through the JAX coordination service.

    Orbax's default barrier is a device collective (``process_allgather``
    over one device per process). Its async-checkpointing thread can run
    such a barrier CONCURRENTLY with main-thread collectives; on backends
    whose cross-process contexts are rendezvoused by execution order
    (CPU/Gloo) the per-process context sequence numbers then diverge and
    both processes deadlock in context init (observed as 30 s
    ``GetKeyValue cpu:gloo/...`` timeouts in ``CheckpointManager``'s
    directory-creation sync). The coordination-service barrier is keyed
    by NAME, thread-safe by design, and exists whenever multi-process
    JAX is initialized — strictly the right transport for barriers."""
    import orbax.checkpoint  # noqa: F401  registers the absl flag
    from absl import flags
    if not flags.FLAGS.is_parsed():
        flags.FLAGS.mark_as_parsed()
    flags.FLAGS.experimental_orbax_use_distributed_barrier = True


def coordination_barrier(name: str, timeout_ms: int = 1_200_000) -> None:
    """Block until every process reaches the barrier ``name``.

    Pure coordination-service RPC — involves NO device program, so it is
    safe to call while other processes are still compiling (the exact
    situation it exists for: ``jax.experimental.multihost_utils``'
    ``sync_global_processes`` is a device psum and would itself deadlock
    there). No-op single-process."""
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def compile_synced(fn, tag: str):
    """Wrap a jitted ``fn`` so each distinct input signature is AOT-compiled
    and then BARRIERED before first execution (multi-process only).

    Why: processes can reach a collective program's first execution with
    arbitrary skew (asymmetric persistent-cache hits, one slow host), and a
    collective rendezvous has a finite timeout — 30 s hardcoded in XLA:CPU's
    Gloo key-value store, where the fast process's first step then dies with
    ``Gloo context initialization failed: DEADLINE_EXCEEDED`` while the slow
    one is still in ``backend_compile``. Compiling FIRST and rendezvousing
    on the (device-free) coordination service bounds execution-time skew by
    step time, not compile time. Single-process returns ``fn`` unchanged."""
    if jax.process_count() <= 1:
        return fn
    compiled = {}

    def signature(args):
        return tuple(
            (tuple(l.shape), str(l.dtype))
            for l in jax.tree_util.tree_leaves(args) if hasattr(l, "shape"))

    def wrapper(*args):
        key = signature(args)
        exe = compiled.get(key)
        if exe is None:
            exe = fn.lower(*args).compile()
            # every process compiles the same programs in the same order
            # (same loader shard shapes), so the k-th barrier matches
            coordination_barrier(f"compile_synced/{tag}/{len(compiled)}")
            compiled[key] = exe
        return exe(*args)

    return wrapper


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
