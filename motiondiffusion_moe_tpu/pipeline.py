"""Text-to-motion generation pipeline (the inference API).

Capability match of ``DDPMTrainer.generate`` / ``generate_batch``
(``trainers/ddpm_trainer.py:145-199``) redesigned TPU-first:

- text is encoded ONCE per prompt set; the unconditional (empty-string)
  embeddings are computed once too — the reference re-encodes the empty
  prompt inside all 1000 steps (``gaussian_diffusion.py:1058-1072``);
- the full CFG denoising loop is a single jit-compiled ``lax.scan`` whose
  step does one doubled-batch forward (cond rows stacked over uncond rows);
- DDPM (1000 steps) and strided DDIM (e.g. 50 steps) share the machinery;
- batches are padded to a fixed micro-batch so one compiled program serves
  any prompt count (the reference re-runs Python per micro-batch of 8);
- an optional ``jax.sharding.Mesh`` makes serving multi-chip: params are
  placed per the DP x EP x TP rules (:func:`parallel.param_shardings`) and
  the batch is sharded over the 'data' axis, so a v5e-8 pod serves one
  pipeline with all chips busy (the BASELINE target hardware).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from motiondiffusion_moe_tpu.config import ExperimentConfig
from motiondiffusion_moe_tpu.diffusion.gaussian import (
    ModelMeanType,
    ModelVarType,
    make_schedule,
)
from motiondiffusion_moe_tpu.diffusion.respace import (
    respace_schedule,
    space_timesteps,
)
from motiondiffusion_moe_tpu.diffusion.sampling import (
    ddim_sample_loop,
    ddpm_sample_loop_cfg,
)
from motiondiffusion_moe_tpu.models.text_encoder import get_text_encoder
from motiondiffusion_moe_tpu.models.transformer import MotionTransformer


class GenerationPipeline:
    """Compiled text -> motion sampler."""

    def __init__(self, cfg: ExperimentConfig,
                 model: Optional[MotionTransformer] = None,
                 params=None,
                 *,
                 sampler: str = "ddpm",          # "ddpm" | "ddim" | "dpm"
                 num_inference_steps: Optional[int] = None,  # None = all T
                 eta: float = 0.0,
                 micro_batch: int = 8,
                 mesh: Optional[Mesh] = None,
                 fetch_window: int = 2,
                 graft_pretrained_text: bool = False,
                 param_dtype: Optional[str] = None):
        self.cfg = cfg
        self.model = model or MotionTransformer(config=cfg.model, mesh=mesh)
        self.mesh = mesh
        self.fetch_window = max(1, fetch_window)
        if mesh is not None:
            dp = mesh.shape.get("data", 1)
            assert micro_batch % dp == 0, (
                f"micro_batch {micro_batch} not divisible by the mesh data "
                f"axis ({dp})")
            from motiondiffusion_moe_tpu.parallel.pipeline_parallel import (
                validate_pp_layout)
            # the sample fn CFG-doubles the batch before the GPipe ring
            # microbatches it; fail here, not inside shard_map
            validate_pp_layout(
                mesh, cfg.model.num_layers, 2 * micro_batch,
                cfg.model.pipeline_microbatches,
                batch_desc="CFG-doubled micro_batch",
                fix_hint="; adjust micro_batch or pipeline_microbatches")
        # serving weight precision: "bfloat16" stores the float32 weights
        # as bf16 on device, halving the per-step weight-read traffic of
        # the sampler (every denoiser weight is read once per diffusion
        # step; compute is already bf16 via ModelConfig.dtype, so this
        # only adds the storage rounding). The FAVOR+ random-feature
        # projections stay float32 — they define the attention kernel's
        # feature map and the fused kernels run them at full precision.
        # Output drift is measured in tests/test_pipeline.py.
        self._param_dtype = (jnp.bfloat16 if param_dtype == "bfloat16"
                             else None)
        if graft_pretrained_text and params is not None:
            # for sampling from FRESH (untrained) params with a pretrained
            # DeBERTa backbone. Default off: params restored from a training
            # checkpoint already carry the (finetuned) text encoder, and
            # re-grafting would overwrite the finetune.
            from motiondiffusion_moe_tpu.models.deberta import (
                graft_pretrained_text_encoder)
            params = graft_pretrained_text_encoder(params, cfg.model)
        self.params = self._place_params(params)
        self.tokenize, _ = get_text_encoder(cfg.model)
        self.micro_batch = micro_batch
        self.sampler = sampler
        self.guidance_scale = cfg.diffusion.cfg_scale
        self.mean_type = ModelMeanType(cfg.diffusion.model_mean_type)
        self.var_type = ModelVarType(cfg.diffusion.model_var_type)
        self.clip_denoised = cfg.diffusion.clip_denoised

        base = make_schedule(schedule_name=cfg.diffusion.beta_schedule,
                             num_timesteps=cfg.diffusion.num_timesteps)
        self.num_inference_steps = num_inference_steps
        if sampler == "dpm":
            # DPM-Solver++ selects its own timesteps on the full schedule
            self.sched = base
            self.timestep_map = None
        elif num_inference_steps and num_inference_steps < cfg.diffusion.num_timesteps:
            self.sched, tmap = respace_schedule(
                np.asarray(base.betas, dtype=np.float64),
                space_timesteps(cfg.diffusion.num_timesteps,
                                f"ddim{num_inference_steps}"))
            # host numpy: embeds as a constant at trace time (an eager
            # jnp.asarray would be a blocking device transfer here)
            self.timestep_map = np.asarray(tmap)
        else:
            self.sched = base
            self.timestep_map = None
        self._compiled = None

    @classmethod
    def from_export(cls, export_dir: str, **kwargs) -> "GenerationPipeline":
        """Build a pipeline from a serving artifact written by
        ``tools/export.py`` — no Trainer, no optimizer state, no orbax
        template. The export's normalizer rides along as
        ``pipeline.normalizer`` (use ``normalizer.denormalize_np`` on
        generated motions before joint recovery). Extra kwargs go to the
        constructor (sampler, micro_batch, mesh, ...)."""
        from motiondiffusion_moe_tpu.tools.export import load_export

        cfg, params, normalizer = load_export(export_dir)
        pipe = cls(cfg, params=params, **kwargs)
        pipe.normalizer = normalizer
        return pipe

    # ------------------------------------------------------------------
    def _place_params(self, params):
        """Optionally cast to the serving dtype, then place params per the
        mesh's DP x EP x TP sharding rules (expert weights over 'expert',
        FFN hidden dims over 'model', rest replicated); pass-through
        without a mesh."""
        if params is None:
            return params
        if self._param_dtype is not None:
            dtype = self._param_dtype

            def cast(path, leaf):
                pstr = jax.tree_util.keystr(path)
                if "projection" in pstr or leaf.dtype != jnp.float32:
                    return leaf
                return leaf.astype(dtype)

            # ONE jitted program for the whole tree: eager per-leaf casts
            # would dispatch ~1,900 device programs (each paying the full
            # control-plane round trip on a remote chip)
            params = jax.jit(lambda p: jax.tree_util.tree_map_with_path(
                cast, p))(params)
        if self.mesh is None:
            return params
        from motiondiffusion_moe_tpu.parallel import param_shardings

        return jax.device_put(params, param_shardings(params, self.mesh))

    def set_params(self, params) -> None:
        """Install (and, under a mesh, shard) new params; keeps the compiled
        sampler (param shapes are unchanged between checkpoints)."""
        self.params = self._place_params(params)

    # ------------------------------------------------------------------
    def _sample_fn(self):
        """Build the jitted (params, ids_c, ids_u, lengths, rng) -> motions
        sampler, closing over static config."""
        model = self.model
        sched = self.sched
        tmap = self.timestep_map
        guidance = self.guidance_scale
        mean_type, var_type = self.mean_type, self.var_type
        clip = self.clip_denoised
        T = self.cfg.model.max_frames
        D = self.cfg.model.input_feats
        use_ddim = self.sampler == "ddim"
        use_dpm = self.sampler == "dpm"
        dpm_steps = self.num_inference_steps or 10
        eta = 0.0

        def fn(params, ids_c, ids_u, lengths, rng):
            B = ids_c.shape[0]
            enc_c = model.apply(params, ids_c,
                                method=lambda m, i: m.encode_text(i))
            enc_u = model.apply(params, ids_u,
                                method=lambda m, i: m.encode_text(i))
            xf_proj = jnp.concatenate([enc_c.pooled, enc_u.pooled], axis=0)
            xf_out = jnp.concatenate([enc_c.tokens, enc_u.tokens], axis=0)
            length2 = jnp.concatenate([lengths, lengths], axis=0)

            def model_doubled(x2, t2):
                out = model.apply(params, x2, t2, length2,
                                  xf_proj=xf_proj, xf_out=xf_out,
                                  mutable=["moe_losses", "moe_metrics"])[0]
                return out

            noise_key, loop_key = jax.random.split(rng)
            noise = jax.random.normal(noise_key, (B, T, D))
            if use_dpm:
                from motiondiffusion_moe_tpu.diffusion.dpm_solver import (
                    dpm_solver_pp_2m)

                return dpm_solver_pp_2m(
                    sched, model_doubled, noise, num_steps=dpm_steps,
                    guidance_scale=guidance, mean_type=mean_type,
                    var_type=var_type, clip_denoised=clip)
            if use_ddim:
                return ddim_sample_loop(
                    sched, model_doubled, noise, loop_key, eta=eta,
                    guidance_scale=guidance, mean_type=mean_type,
                    var_type=var_type, clip_denoised=clip, timestep_map=tmap)
            return ddpm_sample_loop_cfg(
                sched, model_doubled, noise, loop_key,
                guidance_scale=guidance, mean_type=mean_type,
                var_type=var_type, clip_denoised=clip, timestep_map=tmap)

        if self.mesh is None:
            return jax.jit(fn)
        # multi-chip serving: params per the DP x EP x TP rules, batch
        # (token ids / lengths / output motions) sharded over 'data'; XLA
        # inserts the expert all-to-all and row-parallel psums over ICI
        from motiondiffusion_moe_tpu.parallel import param_shardings

        assert self.params is not None, "mesh pipeline needs params at build"
        batch_sh = NamedSharding(self.mesh, P("data"))
        repl = NamedSharding(self.mesh, P())
        return jax.jit(
            fn,
            in_shardings=(param_shardings(self.params, self.mesh),
                          batch_sh, batch_sh, batch_sh, repl),
            out_shardings=batch_sh)

    # ------------------------------------------------------------------
    def generate(self, captions: Sequence[str], m_lens: Sequence[int],
                 rng: Optional[jax.Array] = None) -> List[np.ndarray]:
        """Generate one motion per caption; returns a list of [len_i, D]
        arrays (un-normalized feature space — denormalize with the dataset's
        MotionNormalizer, as the reference's vis/eval paths do)."""
        assert self.params is not None, "set pipeline.params first"
        if len(captions) != len(m_lens):
            raise ValueError(
                f"{len(captions)} captions but {len(m_lens)} lengths")
        T = self.cfg.model.max_frames
        bad = [(i, l) for i, l in enumerate(m_lens) if not 1 <= l <= T]
        if bad:
            # lengths outside [1, max_frames] were previously capped
            # silently mid-pipeline — surface them instead
            i, l = bad[0]
            raise ValueError(
                f"m_lens[{i}]={l} outside [1, max_frames={T}] "
                f"({len(bad)} offending length(s))")
        rng = rng if rng is not None else jax.random.key(0)
        if self._compiled is None:
            self._compiled = self._sample_fn()

        N = len(captions)
        mb = self.micro_batch
        uncond_ids = self.tokenize([""] * mb)
        # Dispatch ahead of the fetch by a BOUNDED window (jax dispatch is
        # async): chunk i+1..i+k's device compute overlaps chunk i's host
        # transfer, hiding the remote-chip fetch latency behind compute,
        # while device-resident output buffers stay O(k) instead of
        # O(total prompts) — large eval-protocol generations (thousands of
        # motions) would otherwise build unbounded HBM pressure.
        window = self.fetch_window
        pending = []
        outputs: List[np.ndarray] = []

        def drain(slot):
            motions, lens, n = slot
            motions = np.asarray(motions)
            for i in range(n):
                outputs.append(motions[i, : int(min(lens[i],
                                                    motions.shape[1]))])

        for start in range(0, N, mb):
            chunk = list(captions[start: start + mb])
            lens = list(m_lens[start: start + mb])
            n = len(chunk)
            # pad the tail chunk to the fixed micro-batch: one compiled shape
            chunk += [""] * (mb - n)
            lens += [self.cfg.model.max_frames] * (mb - n)
            rng, key = jax.random.split(rng)
            motions = self._compiled(
                self.params,
                jnp.asarray(self.tokenize(chunk)),
                jnp.asarray(uncond_ids),
                jnp.asarray(np.minimum(lens, self.cfg.model.max_frames)
                            .astype(np.int32)),
                key)
            pending.append((motions, lens, n))
            if len(pending) > window:
                drain(pending.pop(0))

        for slot in pending:
            drain(slot)
        return outputs

    # ------------------------------------------------------------------
    def generate_motion_embeddings(self, captions: Sequence[str],
                                   m_lens: Sequence[int],
                                   wrapper,
                                   rng: Optional[jax.Array] = None
                                   ) -> np.ndarray:
        """Sample AND evaluator-embed each micro-batch in ONE device
        program; returns [N, 512] co-embedding rows.

        The eval protocol only ever feeds generated motions to the frozen
        motion encoder (``tools/evaluation.py:144-319`` — motions are an
        intermediate); fusing generation with the embedding keeps the
        [B, T, D] motions in HBM and fetches ~2 KB per motion instead of
        ~206 KB (the raw features). That is ~100x less device->host
        traffic — the difference between a runnable and an unrunnable
        protocol through a degraded remote-chip tunnel, and less PCIe
        pressure on production hosts.

        ``wrapper`` is an ``EvaluatorModelWrapper``; frames at or beyond
        each motion's length are zeroed exactly like the host protocol's
        padding (``protocol.py: build_generated_samples``). RNG consumption
        matches ``generate`` chunk-for-chunk, so with the same key this
        path embeds the same motions ``generate`` would return.
        """
        assert self.params is not None, "set pipeline.params first"
        if self.mesh is not None:
            # mesh serving shards the sampler explicitly; the fused embed
            # program would need evaluator shardings too — generate + host
            # embedding is the supported path there
            raise NotImplementedError(
                "generate_motion_embeddings supports single-device "
                "pipelines; use generate() + get_motion_embeddings under "
                "a mesh")
        T = self.cfg.model.max_frames
        if self._compiled is None:
            self._compiled = self._sample_fn()
        if getattr(self, "_embed_compiled", None) is None:
            sample = self._compiled
            unit = wrapper.unit_length

            def fused(params, ev_params, ids_c, ids_u, lengths, key):
                m = sample(params, ids_c, ids_u, lengths, key)
                mask = (jnp.arange(T)[None, :, None]
                        < lengths[:, None, None])
                m = jnp.where(mask, m, 0.0)
                movements = wrapper.movement_enc.apply(
                    ev_params["movement"], m[..., :-4])
                return wrapper.motion_enc.apply(
                    ev_params["motion"], movements, lengths // unit)

            self._embed_compiled = jax.jit(fused)

        rng = rng if rng is not None else jax.random.key(0)
        N = len(captions)
        mb = self.micro_batch
        uncond_ids = self.tokenize([""] * mb)
        window = self.fetch_window
        pending: List = []
        outputs: List[np.ndarray] = []

        def drain(slot):
            embs, n = slot
            outputs.append(np.asarray(embs)[:n])

        for start in range(0, N, mb):
            chunk = list(captions[start: start + mb])
            lens = list(m_lens[start: start + mb])
            n = len(chunk)
            chunk += [""] * (mb - n)
            lens += [T] * (mb - n)
            rng, key = jax.random.split(rng)
            embs = self._embed_compiled(
                self.params, wrapper.params,
                jnp.asarray(self.tokenize(chunk)),
                jnp.asarray(uncond_ids),
                jnp.asarray(np.minimum(lens, T).astype(np.int32)),
                key)
            pending.append((embs, n))
            if len(pending) > window:
                drain(pending.pop(0))
        for slot in pending:
            drain(slot)
        return np.concatenate(outputs, axis=0) if outputs else \
            np.zeros((0, 512), np.float32)
