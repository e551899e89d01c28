"""Device mesh + sharding rules (DP x EP x TP).

The reference's entire distributed story is DDP over NCCL
(``tools/train.py:95-100,140-145``; SURVEY.md §2.4). TPU-native replacement:
one ``jax.sharding.Mesh`` with axes ``('data', 'expert', 'model')``:

- **data**: batch dimension sharded; gradient reduction is XLA SPMD's
  implicit psum over ICI (no DDP hooks, no NCCL).
- **expert**: the leading E dimension of every MoE expert weight
  ([E, D, H] / [E, H, D] / biases) sharded; XLA partitions the dispatch/
  combine einsums and inserts the all-to-all over ICI. An explicit
  ``shard_map`` + Pallas dispatch path lives in ``moe_parallel`` for manual
  control at larger expert counts.
- **model** (tensor parallelism): Megatron-style column/row split of the
  FFN weights — the MoE expert hidden dim ([E, D, H] column-sharded on H,
  [E, H, D] row-sharded on H), the DenseFFN branches, and the exact
  cross-attention block's 4x MLP. The first matmul of each pair is
  column-parallel, the second row-parallel; XLA inserts the closing
  psum over ICI. Attention itself runs replicated on this axis: at
  latent 512 / 4 heads the Performer Pallas kernels are below the size
  where head-sharding pays (SURVEY.md §2.4 scopes TP optional at this
  model size), so TP here covers the FFN stacks — where the per-layer
  weight mass is — and composes with DP and EP.

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
SEQ_AXIS = "seq"
PIPE_AXIS = "pipe"
EXPERT_AXIS = "expert"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None,
              expert_parallel: int = 1,
              tensor_parallel: int = 1,
              seq_parallel: int = 1,
              pipeline_parallel: int = 1) -> Mesh:
    """Mesh of shape
    (data = n/(sp*pp*ep*tp)[, seq = sp][, pipe = pp], expert = ep, model = tp).

    The 'seq' axis (sequence/context parallelism: activations sharded on
    the frame dimension T, the Performer kv-moment reduction closed by an
    XLA all-reduce) and the 'pipe' axis (pipeline parallelism: the
    ``scan_blocks`` stacked layer dim sharded into contiguous stages, a
    GPipe microbatch ring via shard_map + ppermute) are inserted only when
    their degree is > 1, so existing 3-axis meshes — and every shard_map
    spec written against them — are unchanged. 'seq' shards no parameters;
    'pipe' shards ONLY the stacked decoder-block leaves (leading [L] axis).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), f"want {n} devices, have {len(devices)}"
    degrees = (expert_parallel * tensor_parallel * seq_parallel
               * pipeline_parallel)
    assert n % degrees == 0, (n, degrees)
    dp = n // degrees
    axes = [(DATA_AXIS, dp)]
    if seq_parallel > 1:
        axes.append((SEQ_AXIS, seq_parallel))
    if pipeline_parallel > 1:
        axes.append((PIPE_AXIS, pipeline_parallel))
    axes += [(EXPERT_AXIS, expert_parallel), (MODEL_AXIS, tensor_parallel)]
    arr = np.asarray(devices[:n]).reshape([s for _, s in axes])
    return Mesh(arr, tuple(name for name, _ in axes))


def batch_spec() -> P:
    return P(DATA_AXIS)


def _is_expert_param(path: str, leaf) -> bool:
    # SwitchMoELayer expert weights: w1 [E,D,H], w2 [E,H,D], b1 [E,H], b2 [E,D]
    return ("_moe" in path) and any(
        path.endswith(f"['{n}']") for n in ("w1", "w2", "b1", "b2"))


def _param_spec(pstr: str, leaf, ep: int, tp: int, pp: int = 1) -> P:
    """PartitionSpec for one parameter leaf under the DP x EP x TP (x PP)
    rules.

    Leaves under a ``blocks_*`` subtree come from the ``scan_blocks=True``
    stacked layout and carry a leading [L] layer axis: the rules below
    apply to the per-layer shape. The layer axis is sharded over 'pipe'
    (contiguous stages — XLA shards dim 0 in equal contiguous chunks) when
    pipeline parallelism is on, else left unsharded.
    """
    if not hasattr(leaf, "ndim"):
        return P()
    shape = leaf.shape
    lead = 1 if "['blocks_" in pstr else 0  # nn.scan stacked layer axis
    lead_ax = (PIPE_AXIS,) if (
        lead and pp > 1 and shape[0] % pp == 0) else (None,) * lead
    shape = shape[lead:]

    def spec(*axes):
        return P(*lead_ax, *axes)

    def div(dim, k):
        return k > 1 and dim < len(shape) and shape[dim] % k == 0

    if _is_expert_param(pstr, leaf):
        # expert dim 0 over 'expert'; hidden dim over 'model' (Megatron
        # column-split on w1/b1, row-split on w2; b2 output stays whole)
        e_ax = EXPERT_AXIS if div(0, ep) else None
        name = pstr.rsplit("'", 2)[-2]
        if name == "w1" and div(2, tp):      # [E, D, H]
            return spec(e_ax, None, MODEL_AXIS)
        if name == "b1" and div(1, tp):      # [E, H]
            return spec(e_ax, MODEL_AXIS)
        if name == "w2" and div(1, tp):      # [E, H, D]
            return spec(e_ax, MODEL_AXIS, None)
        return spec(e_ax, *([None] * (len(shape) - 1)))

    # Dense FFN pairs (DenseFFN branches + CrossAttentionBlock residual MLP):
    # first matmul column-parallel, second row-parallel
    col = ("_fc1" in pstr) or ("ffn_0" in pstr)
    row = ("_fc2" in pstr) or ("ffn_1" in pstr)
    if col and pstr.endswith("['kernel']") and div(1, tp):
        return spec(None, MODEL_AXIS)
    if col and pstr.endswith("['bias']") and div(0, tp):
        return spec(MODEL_AXIS)
    if row and pstr.endswith("['kernel']") and div(0, tp):
        return spec(MODEL_AXIS, None)
    # default: replicated — except the stacked layer axis, which still
    # shards over 'pipe' for EVERY stacked block leaf
    return spec()


def _zero1_spec(spec: P, shape, dp: int) -> P:
    """Add the 'data' axis to the first unsharded, dp-divisible dim.

    ZeRO-1: optimizer moments (and EMA weights) are read/written only by
    the elementwise update, so unlike params they never need to be whole
    on any device — sharding them over 'data' cuts their per-device HBM
    ~dp-fold, and GSPMD turns the gradient all-reduce into a
    reduce-scatter feeding a sharded update plus one all-gather of the
    updates (the ZeRO-1 communication pattern), instead of every device
    redundantly running the full Adam update.
    """
    if dp <= 1 or not shape:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    for i, (ax, dim) in enumerate(zip(entries, shape)):
        if ax is None and dim % dp == 0:
            entries[i] = DATA_AXIS
            return P(*entries)
    return spec


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree per the DP x EP x TP (x PP) rules (see module
    doc)."""
    ep = mesh.shape.get(EXPERT_AXIS, 1)
    tp = mesh.shape.get(MODEL_AXIS, 1)
    pp = mesh.shape.get(PIPE_AXIS, 1)

    def rule(path, leaf):
        pstr = jax.tree_util.keystr(path)
        return NamedSharding(mesh, _param_spec(pstr, leaf, ep, tp, pp))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(batch: Any, mesh: Mesh, leading_dims: int = 0) -> Any:
    """Place a host batch dict with the batch dim sharded over 'data'
    (``leading_dims`` unsharded axes before it, e.g. the K axis of a
    stacked multi-step batch).

    Multi-process (pod): each process passes its PROCESS-LOCAL batch
    ([B/num_processes, ...] rows from its own ``DistributedSampler`` shard)
    and gets back the GLOBAL array — ``jax.make_array_from_process_local_data``
    places local rows on the process's addressable devices and infers the
    global batch dim as local x num_processes. Process p's rows land at
    global positions [p*B_local, (p+1)*B_local) because ``make_mesh`` lays
    the leading 'data' axis out in ``jax.devices()`` order, which sorts
    devices process-contiguously. This is the TPU analog of the
    reference's per-rank DistributedSampler feeding DDP
    (``tools/train.py:159-164``)."""
    sharding = NamedSharding(mesh, P(*([None] * leading_dims), DATA_AXIS))

    if jax.process_count() > 1:
        def put(leaf):
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(leaf))
    else:
        def put(leaf):
            return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(put, batch)


def make_sharded_train_step(train_step: Callable, state: Any,
                            mesh: Mesh,
                            batch_leading_dims: int = 0,
                            zero1: bool = False
                            ) -> Tuple[Callable, Any]:
    """Wrap a (state, batch, rng) train step with mesh shardings.

    Returns (sharded_step, sharded_state): state placed per the param rules,
    batch expected data-sharded (see :func:`shard_batch`), rng replicated.
    Gradient psum over 'data', MoE all-to-all over 'expert', and the
    row-parallel closing psum over 'model' are inserted by the XLA SPMD
    partitioner.

    ``batch_leading_dims``: number of unsharded axes BEFORE the batch axis
    in every batch leaf — 1 for the stacked [K, B, ...] batches of
    :func:`training.make_multi_train_step`.

    ``zero1``: additionally shard the optimizer moments and the EMA
    weights over the 'data' axis (see :func:`_zero1_spec`). Params keep
    their own (data-replicated) shardings, so the forward/backward is
    unchanged; only the update's memory and math are data-partitioned.
    """
    replicated = NamedSharding(mesh, P())
    ep = mesh.shape.get(EXPERT_AXIS, 1)
    tp = mesh.shape.get(MODEL_AXIS, 1)
    pp = mesh.shape.get(PIPE_AXIS, 1)
    dp = mesh.shape.get(DATA_AXIS, 1)

    def rule(path, leaf):
        """Param shardings mirror into the adam moments (same tree paths)."""
        pstr = jax.tree_util.keystr(path)
        spec = _param_spec(pstr, leaf, ep, tp, pp)
        if zero1 and pstr.startswith((".opt_state", ".ema_params")) \
                and hasattr(leaf, "shape"):
            spec = _zero1_spec(spec, leaf.shape, dp)
        return NamedSharding(mesh, spec)

    state_shardings = jax.tree_util.tree_map_with_path(
        rule, state, is_leaf=lambda x: isinstance(x, jax.Array))

    sharded_state = jax.device_put(state, state_shardings)
    batch_sharding = NamedSharding(
        mesh, P(*([None] * batch_leading_dims), DATA_AXIS))

    step = jax.jit(
        train_step,
        in_shardings=(state_shardings, batch_sharding, replicated),
        out_shardings=(state_shardings, replicated),
        donate_argnums=(0,))
    return step, sharded_state
