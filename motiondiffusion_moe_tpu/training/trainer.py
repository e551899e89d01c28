"""Training orchestration.

Capability match of ``DDPMTrainer.train`` (``trainers/ddpm_trainer.py:
291-362``): epoch loop, per-batch conditional + unconditional double step
(``:319-333``), periodic loss logging (``:342-347``), rolling latest +
per-epoch checkpoints, auto-resume. Host-side work per step: sample t from
the schedule sampler, tokenize captions; everything else is one jitted call.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from motiondiffusion_moe_tpu.config import ExperimentConfig
from motiondiffusion_moe_tpu.parallel import (
    EXPERT_AXIS,
    MODEL_AXIS,
    make_mesh,
    make_sharded_train_step,
    shard_batch,
)
from motiondiffusion_moe_tpu.diffusion.gaussian import make_schedule
from motiondiffusion_moe_tpu.diffusion.samplers import (
    LossAwareSampler,
    create_named_schedule_sampler,
)
from motiondiffusion_moe_tpu.models.text_encoder import get_text_encoder
from motiondiffusion_moe_tpu.models.transformer import MotionTransformer
from motiondiffusion_moe_tpu.training.checkpoint import CheckpointManager
from motiondiffusion_moe_tpu.training.train_state import (
    TrainState,
    create_train_state,
    make_train_step,
)
from motiondiffusion_moe_tpu.utils.logging import MetricsLogger


class Trainer:
    def __init__(self, cfg: ExperimentConfig,
                 model: Optional[MotionTransformer] = None,
                 normalizer_stats=None,
                 logger: Optional[MetricsLogger] = None):
        self.cfg = cfg
        self.accum = max(1, cfg.train.grad_accum_steps)
        # the [A, ...] microbatch axis _chunk prepends when accumulating —
        # shard_batch / make_sharded_train_step must agree on it everywhere
        self._lead = 1 if self.accum > 1 else 0
        self._warned_ragged = False
        if cfg.train.batch_size % self.accum != 0:
            raise ValueError(
                f"batch_size {cfg.train.batch_size} not divisible by "
                f"grad_accum_steps {self.accum}")
        self.mesh = self._maybe_make_mesh(cfg)
        if self.mesh is not None:
            from motiondiffusion_moe_tpu.parallel.pipeline_parallel import (
                validate_pp_layout)
            # under accumulation the pipeline sees one microbatch (B/A) at
            # a time, so THAT is the batch the PP layout must divide
            validate_pp_layout(
                self.mesh, cfg.model.num_layers,
                cfg.train.batch_size // self.accum,
                cfg.model.pipeline_microbatches,
                fix_hint=("; adjust --batch_size / --grad_accum / "
                          "--pp_microbatches / --num_layers"))
        sharded_axes = self.mesh is not None and (
            self.mesh.shape.get(EXPERT_AXIS, 1) > 1
            or self.mesh.shape.get(MODEL_AXIS, 1) > 1)
        if sharded_axes and cfg.model.moe_compute == "dense_fused":
            # dense_fused merges the expert AND hidden dims into one matmul:
            # the SPMD partitioner can neither shard the merged E dim over
            # 'expert' nor the merged H dim over 'model' (it would all-gather
            # the expert FFN weights every step). EP/TP runs use the
            # per-expert einsum form instead.
            if model is not None:
                raise ValueError(
                    "caller-supplied model uses moe_compute='dense_fused' on "
                    f"a mesh with expert/model axes {dict(self.mesh.shape)}: "
                    "the fused matmul cannot be expert- or tensor-sharded. "
                    "Build the model with moe_compute='dense' (or "
                    "'dispatch') for EP/TP runs.")
            import dataclasses
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, moe_compute="dense"))
            self.cfg = cfg
        # the mesh rides along as static module metadata: with
        # moe_compute="dispatch" and an expert axis > 1 the MoE layers
        # route through the explicit shard_map all-to-all
        self.model = model or MotionTransformer(config=cfg.model,
                                                mesh=self.mesh)
        self.tokenize, _ = get_text_encoder(cfg.model)
        self.sched = make_schedule(
            schedule_name=cfg.diffusion.beta_schedule,
            num_timesteps=cfg.diffusion.num_timesteps)
        self.sampler = create_named_schedule_sampler(
            cfg.diffusion.schedule_sampler, cfg.diffusion.num_timesteps)
        # With a mesh, jit happens in fit() via make_sharded_train_step
        # (it needs the state to derive shardings); without, jit here.
        self.train_step = make_train_step(self.model, self.sched, cfg,
                                          normalizer_stats=normalizer_stats,
                                          jit=self.mesh is None)
        if cfg.train.steps_per_call > 1:
            # K steps per compiled call (lax.scan): amortizes the fixed
            # per-dispatch host cost — see make_multi_train_step
            from motiondiffusion_moe_tpu.training.train_state import (
                make_multi_train_step)
            self.multi_step = make_multi_train_step(
                self.model, self.sched, cfg,
                normalizer_stats=normalizer_stats, jit=self.mesh is None)
        else:
            self.multi_step = None
        self.logger = logger or MetricsLogger(cfg.train.log_every)
        # Host-side RNG (schedule-sampler t draws, caption dropout) must be
        # DECORRELATED across processes — every process draws t for its own
        # local rows of the global batch, and identical streams would give
        # every host the same timesteps (process_index()*K is a no-op
        # single-process, so goldens are unchanged).
        self._np_rng = np.random.default_rng(
            cfg.train.seed + 1_000_003 * jax.process_index())

    @staticmethod
    def _maybe_make_mesh(cfg: ExperimentConfig):
        """DP x EP mesh per ParallelConfig (replaces the reference's DDP
        wiring, ``tools/train.py:95-145``).

        Sharded when EP > 1 or DP is explicit; on a real accelerator
        backend, auto-DP over all visible devices. On the CPU backend
        auto stays single-device (unit tests run on a virtual 8-device
        CPU mesh and must not silently shard).
        """
        ep = cfg.parallel.num_expert_partitions
        tp = cfg.parallel.num_model_partitions
        sp = cfg.parallel.num_seq_partitions
        pp = cfg.parallel.num_pipeline_stages
        dp = cfg.parallel.num_data_partitions
        ndev = len(jax.devices())
        # Multi-process (pod): SPMD over the GLOBAL mesh is the only way
        # the processes cooperate — a mesh is mandatory, any backend.
        multiproc = jax.process_count() > 1
        auto_dp = (dp == 0 and ndev > 1
                   and (multiproc or jax.default_backend() not in ("cpu",)))
        if ep <= 1 and tp <= 1 and sp <= 1 and pp <= 1 and dp <= 1 \
                and not auto_dp:
            return None
        deg = ep * tp * sp * pp
        if dp == 0:
            n = (ndev // deg) * deg
        else:
            n = dp * deg
        assert n >= 1 and n <= ndev, (
            f"parallel config wants {n} devices (dp={dp} x sp={sp} x "
            f"pp={pp} x ep={ep} x tp={tp}), have {ndev}")
        # under gradient accumulation the array that actually carries the
        # sharded batch axis is ONE microbatch (B/A), so that is what the
        # data axis must divide
        accum = max(1, cfg.train.grad_accum_steps)
        micro = cfg.train.batch_size // accum
        if micro % (n // deg) != 0:
            raise ValueError(
                f"microbatch {micro} (batch_size {cfg.train.batch_size} / "
                f"grad_accum_steps {accum}) not divisible by the data axis "
                f"({n // deg}); adjust --batch_size / --grad_accum / "
                "--data_parallel")
        return make_mesh(n, expert_parallel=ep, tensor_parallel=tp,
                         seq_parallel=sp, pipeline_parallel=pp)

    # ------------------------------------------------------------------
    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.key(
            self.cfg.train.seed, impl=self.cfg.train.jax_rng_impl)
        state = create_train_state(self.model, self.cfg, rng)
        if self.cfg.model.text_encoder.startswith("deberta"):
            # graft pretrained DeBERTa weights (or warn-and-random-init) —
            # the reference trains from `AutoModel.from_pretrained(...)`
            # (text_encoder.py:9-11); adam moments stay zero, so grafting
            # after optimizer init is exact
            from motiondiffusion_moe_tpu.models.deberta import (
                graft_pretrained_text_encoder)
            grafted = graft_pretrained_text_encoder(
                state.params, self.cfg.model)
            # the EMA copy was snapshotted at create_train_state time, i.e.
            # BEFORE the graft: refresh it too, or --use_ema sampling would
            # keep ~d^steps weight on the random pre-graft text encoder
            ema = state.ema_params
            if ema is not None:
                ema = {"params": grafted["params"]}
            state = state.replace(params=grafted, ema_params=ema)
        return state

    def _make_batch(self, captions, motions, lengths) -> Dict[str, jnp.ndarray]:
        B = motions.shape[0]
        t, w = self.sampler.sample(B, self._np_rng)
        if self.cfg.train.caption_dropout > 0:
            drop = self._np_rng.random(B) < self.cfg.train.caption_dropout
            captions = ["" if d else c for c, d in zip(captions, drop)]
        return {
            "motion": jnp.asarray(motions),
            "length": jnp.asarray(lengths),
            "text_ids": jnp.asarray(self.tokenize(list(captions))),
            "t": jnp.asarray(t),
            "t_weight": jnp.asarray(w),
        }

    def _chunk(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """[B, ...] -> [A, B/A, ...] for gradient accumulation (contiguous
        split, so the step's per_sample_mse reshape restores batch order).
        Chunking happens HOST-side, before shard_batch, so each microbatch
        arrives data-sharded on its own batch axis."""
        if self.accum <= 1:
            return batch
        A = self.accum
        B = batch["motion"].shape[0]
        if B % A != 0:
            # ragged tail from a drop_last=False loader (the built-in
            # distributed loader round-up-pads, so only custom loaders hit
            # this): run the tail as ONE unaccumulated update rather than
            # killing the run at epoch end
            if not self._warned_ragged:
                self._warned_ragged = True
                print(f"[trainer] ragged tail batch of {B} not divisible "
                      f"by grad_accum_steps {A}; running it as a single "
                      "unaccumulated update")
            return {k: v.reshape(1, B, *v.shape[1:])
                    for k, v in batch.items()}
        return {k: v.reshape(A, B // A, *v.shape[1:])
                for k, v in batch.items()}

    def _update_sampler(self, batch, metrics) -> None:
        if not isinstance(self.sampler, LossAwareSampler):
            return
        t_local = np.asarray(batch["t"]).reshape(-1)
        losses = np.asarray(metrics["per_sample_mse"]).reshape(-1)
        n = jax.process_count()
        if n > 1 and losses.shape[0] == t_local.shape[0] * n:
            # the jitted step returns GLOBAL per-sample losses (replicated
            # output) while batch["t"] holds this process's LOCAL rows:
            # slice our block out of each grad-accum chunk (process p's
            # rows sit at [p*m, (p+1)*m) of every [B_global/A] chunk —
            # see parallel.shard_batch). The sampler then allgathers the
            # (t, loss) pairs across processes itself.
            A = self.accum if t_local.shape[0] % self.accum == 0 else 1
            g = losses.reshape(A, -1)
            m = g.shape[1] // n
            p = jax.process_index()
            losses = g[:, p * m:(p + 1) * m].reshape(-1)
        self.sampler.update_with_local_losses(t_local, losses)

    # ------------------------------------------------------------------
    def fit(self, state: TrainState, loader: Iterable,
            rng: Optional[jax.Array] = None,
            checkpoints: Optional[CheckpointManager] = None,
            start_epoch: int = 0) -> TrainState:
        cfg = self.cfg
        # rng_impl="rbg": TPU-native RngBitGenerator for the training
        # stream (dropout masks dominate otherwise — see TrainConfig)
        rng = rng if rng is not None else jax.random.key(
            cfg.train.seed + 1, impl=cfg.train.jax_rng_impl)

        # multi-process: only the primary prints/logs (the reference
        # patches builtins.print master-only, tools/train.py:31-43);
        # checkpoint saves stay COLLECTIVE — every process participates
        primary = jax.process_index() == 0

        if checkpoints is not None:
            restored = checkpoints.restore_with_rng(state)
            if restored is not None:
                template = state
                state, start_epoch, saved_rng = restored
                # fit OWNS the passed-in state (the jitted step donates its
                # buffers anyway, so callers can never reuse it): free the
                # init template's device buffers NOW. Keeping it alive
                # through the caller's frame double-residents the full
                # train state — at flagship scale ~5.8 GB of f32
                # params+moments+EMA — and the resumed first K-step scanned
                # call OOMs a 16 GB chip that the fresh run fits on.
                live = {id(l) for l in jax.tree_util.tree_leaves(state)}
                for leaf in jax.tree_util.tree_leaves(template):
                    if isinstance(leaf, jax.Array) and id(leaf) not in live \
                            and not leaf.is_deleted():
                        leaf.delete()
                del template
                if saved_rng is not None:
                    rng = saved_rng
                if primary:
                    print(f"[trainer] resumed from step {int(state.step)} "
                          f"(epoch {start_epoch})")

        if self.mesh is not None:
            # restore happens above on host/default placement; this places
            # the (possibly restored) state per the mesh sharding rules and
            # jits the step with explicit in/out shardings.
            step_fn, state = make_sharded_train_step(
                self.train_step, state, self.mesh,
                batch_leading_dims=self._lead,
                zero1=cfg.parallel.zero1)
            if self.multi_step is not None:
                multi_fn, state = make_sharded_train_step(
                    self.multi_step, state, self.mesh,
                    batch_leading_dims=1 + self._lead,
                    zero1=cfg.parallel.zero1)
            else:
                multi_fn = None
            if jax.process_count() > 1:
                # first execution of each program is compile+barrier'd:
                # collective rendezvous must not race another process's
                # compile (XLA:CPU Gloo rendezvous times out at 30 s; see
                # parallel.distributed.compile_synced)
                from motiondiffusion_moe_tpu.parallel.distributed import (
                    compile_synced)
                step_fn = compile_synced(step_fn, "step")
                if multi_fn is not None:
                    multi_fn = compile_synced(multi_fn, "multi_step")
            if primary:
                print(f"[trainer] mesh {dict(self.mesh.shape)} "
                      f"({self.mesh.devices.size} devices, "
                      f"{jax.process_count()} processes)")
        else:
            step_fn = self.train_step
            multi_fn = self.multi_step

        K = max(1, cfg.train.steps_per_call)
        if K > 1 and isinstance(self.sampler, LossAwareSampler):
            # Loss-aware samplers draw each sub-batch's t from weights
            # updated after EVERY step (samplers.py); buffering K batches
            # would draw from weights up to K steps stale — silently
            # different importance sampling. Keep the reference cadence.
            if primary:
                print("[trainer] steps_per_call>1 is incompatible with "
                      f"loss-aware schedule sampler "
                      f"'{cfg.diffusion.schedule_sampler}' (t would be drawn "
                      "from stale weights); falling back to 1 step/call")
            K = 1
        it = int(state.step)
        start_time = time.time()

        def maybe_save(prev_it, epoch):
            if checkpoints is None:
                return
            every = cfg.train.save_latest_every
            if it // every > prev_it // every:
                checkpoints.save(it, state, epoch, rng=rng)

        pending = []  # sub-step batches awaiting the K-step scanned call

        def run_pending(epoch, force=False):
            """Run buffered sub-steps: full chunks of K through the scanned
            program; on force (epoch end), the remainder one-by-one through
            the single-step program (identical semantics)."""
            nonlocal state, rng, it
            while len(pending) >= K:
                chunk = [pending.pop(0) for _ in range(K)]
                rng, key = jax.random.split(rng)
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[self._chunk(c) for c in chunk])
                if self.mesh is not None:
                    stacked = shard_batch(stacked, self.mesh,
                                          leading_dims=1 + self._lead)
                prev = it
                state, ms = multi_fn(state, stacked, key)
                it = int(state.step)
                # ONE host transfer for the whole K-step metrics dict.
                # float()-ing each scalar individually is ~K*len(ms)
                # blocking device fetches per call — through the remote-chip
                # tunnel (seconds of round-trip latency each) that turned a
                # ~3 s scanned call into ~10 min of metric reads (round-4
                # soak, .soak/soak1.log epoch 1).
                ms = jax.device_get(ms)
                for i, sub_batch in enumerate(chunk):
                    sub = {k: v[i] for k, v in ms.items()}
                    self._update_sampler(sub_batch, sub)
                    if primary:
                        logs = OrderedDict(
                            (k, float(v)) for k, v in sub.items()
                            if np.ndim(v) == 0)
                        self.logger.log(prev + i + 1, epoch, logs,
                                        start_time)
                maybe_save(prev, epoch)
            if force:
                while pending:
                    sub_batch = pending.pop(0)
                    rng, key = jax.random.split(rng)
                    b = self._chunk(sub_batch)
                    if self.mesh is not None:
                        b = shard_batch(
                            b, self.mesh,
                            leading_dims=self._lead)
                    prev = it
                    state, metrics = step_fn(state, b, key)
                    it = int(state.step)
                    self._update_sampler(sub_batch, metrics)
                    if primary:
                        logs = OrderedDict(
                            (k, float(v)) for k, v in metrics.items()
                            if np.ndim(v) == 0)
                        self.logger.log(it, epoch, logs, start_time)
                    maybe_save(prev, epoch)

        for epoch in range(start_epoch, cfg.train.num_epochs):
            if hasattr(loader, "set_epoch"):
                loader.set_epoch(epoch)
            for captions, motions, lengths in loader:
                batch = self._make_batch(captions, motions, lengths)
                if K > 1:
                    if pending and (batch["motion"].shape[0]
                                    != pending[0]["motion"].shape[0]):
                        # ragged tail batch (drop_last=False loaders): the
                        # K-chunk stack needs equal leading dims — drain
                        # the buffer through the single-step path first
                        run_pending(epoch, force=True)
                    pending.append(batch)
                    if cfg.train.uncond_step:
                        # the (cond, uncond) double step keeps its order in
                        # the scanned stream (ddpm_trainer.py:319-333)
                        pending.append(self._make_batch(
                            [""] * len(captions), motions, lengths))
                    run_pending(epoch)
                    continue

                rng, k1, k2 = jax.random.split(rng, 3)
                b = self._chunk(batch)
                if self.mesh is not None:
                    b = shard_batch(b, self.mesh,
                                    leading_dims=self._lead)
                prev = it
                state, metrics = step_fn(state, b, k1)
                self._update_sampler(batch, metrics)
                logs = OrderedDict(
                    (k, float(v)) for k, v in metrics.items()
                    if np.ndim(v) == 0)

                if cfg.train.uncond_step:
                    # second, unconditional forward+update (ddpm_trainer.py:
                    # 319-333): same compiled fn, empty captions
                    uncond = self._make_batch([""] * len(captions), motions,
                                              lengths)
                    ub = self._chunk(uncond)
                    if self.mesh is not None:
                        ub = shard_batch(
                            ub, self.mesh,
                            leading_dims=self._lead)
                    state, umetrics = step_fn(state, ub, k2)
                    self._update_sampler(uncond, umetrics)
                    for k, v in umetrics.items():
                        if np.ndim(v) == 0:
                            logs[f"uncond_{k}"] = float(v)

                it = int(state.step)
                if primary:
                    self.logger.log(it, epoch, logs, start_time)
                maybe_save(prev, epoch)

            run_pending(epoch, force=True)
            if checkpoints is not None:
                # End-of-epoch save records epoch+1 (the NEXT epoch) so a
                # resume continues the epoch counter instead of re-running
                # the completed epoch — the reference resumes at the epoch
                # after the checkpointed one (ddpm_trainer.py epoch loop).
                # Mid-epoch cadence saves (maybe_save) keep the
                # in-progress epoch: resume re-runs that epoch's loader, a
                # bounded one-epoch replay. When the cadence save already
                # captured this exact step (orbax silently skips duplicate
                # steps), a tiny sidecar marker carries the epoch+1 —
                # without it the round-5 soak's resume re-ran a full epoch
                # (save_latest=512 aligned with a 512-step epoch: 1536
                # steps trained where num_epochs promised 1024).
                if checkpoints.latest_step() == it:
                    checkpoints.mark_epoch_complete(it, epoch + 1)
                else:
                    checkpoints.save(it, state, epoch + 1, rng=rng)
        if checkpoints is not None:
            checkpoints.wait()
        return state
