"""Device mesh + sharding rules (DP x EP).

The reference's entire distributed story is DDP over NCCL
(``tools/train.py:95-100,140-145``; SURVEY.md §2.4). TPU-native replacement:
one ``jax.sharding.Mesh`` with axes ``('data', 'expert')``:

- **data**: batch dimension sharded; gradient reduction is XLA SPMD's
  implicit psum over ICI (no DDP hooks, no NCCL).
- **expert**: the leading E dimension of every MoE expert weight
  ([E, D, H] / [E, H, D] / biases) sharded; XLA partitions the dispatch/
  combine einsums and inserts the all-to-all over ICI. An explicit
  ``shard_map`` + Pallas dispatch path lives in ``moe_parallel`` for manual
  control at larger expert counts.

Everything here also runs unmodified on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) — how tests and the driver's
``dryrun_multichip`` validate multi-chip behavior without hardware.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EXPERT_AXIS = "expert"


def make_mesh(n_devices: Optional[int] = None,
              expert_parallel: int = 1) -> Mesh:
    """Mesh of shape (data = n/ep, expert = ep)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), f"want {n} devices, have {len(devices)}"
    assert n % expert_parallel == 0
    arr = np.asarray(devices[:n]).reshape(n // expert_parallel,
                                          expert_parallel)
    return Mesh(arr, (DATA_AXIS, EXPERT_AXIS))


def batch_spec() -> P:
    return P(DATA_AXIS)


def _is_expert_param(path: str, leaf) -> bool:
    # SwitchMoELayer expert weights: w1 [E,D,H], w2 [E,H,D], b1 [E,H], b2 [E,D]
    return ("_moe" in path) and any(
        path.endswith(f"['{n}']") for n in ("w1", "w2", "b1", "b2"))


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree: expert weights sharded on their E dim over the
    'expert' axis (when divisible), everything else replicated."""
    ep = mesh.shape[EXPERT_AXIS]

    def rule(path, leaf):
        pstr = jax.tree_util.keystr(path)
        if _is_expert_param(pstr, leaf) and leaf.shape[0] % ep == 0 and ep > 1:
            return NamedSharding(
                mesh, P(EXPERT_AXIS, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch dict with the leading dim sharded over 'data'."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def put(leaf):
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(put, batch)


def make_sharded_train_step(train_step: Callable, state: Any,
                            mesh: Mesh) -> Tuple[Callable, Any]:
    """Wrap a (state, batch, rng) train step with mesh shardings.

    Returns (sharded_step, sharded_state): state placed per the param rules,
    batch expected data-sharded (see :func:`shard_batch`), rng replicated.
    Gradient psum over 'data' and MoE all-to-all over 'expert' are inserted
    by the XLA SPMD partitioner.
    """
    replicated = NamedSharding(mesh, P())
    ep = mesh.shape[EXPERT_AXIS]

    def rule(path, leaf):
        """Expert weights (and their adam moments, which mirror the param
        tree paths) shard on dim 0 over 'expert'; everything else
        replicates."""
        pstr = jax.tree_util.keystr(path)
        if (hasattr(leaf, "ndim") and leaf.ndim >= 1 and ep > 1
                and _is_expert_param(pstr, leaf)
                and leaf.shape[0] % ep == 0):
            return NamedSharding(mesh, P(EXPERT_AXIS, *([None] * (leaf.ndim - 1))))
        return replicated

    state_shardings = jax.tree_util.tree_map_with_path(
        rule, state, is_leaf=lambda x: isinstance(x, jax.Array))

    sharded_state = jax.device_put(state, state_shardings)
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    step = jax.jit(
        train_step,
        in_shardings=(state_shardings, batch_sharding, replicated),
        out_shardings=(state_shardings, replicated),
        donate_argnums=(0,))
    return step, sharded_state
