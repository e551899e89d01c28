"""Orbax checkpointing with auto-resume.

Capability match of the reference's checkpoint/resume subsystem
(``trainers/ddpm_trainer.py:260-305,350-362``): dual cadence — a rolling
``latest`` by iteration plus ``ckpt_e{N}`` every few epochs — and resume
from latest. The reference resumes UNCONDITIONALLY (``if True:`` at
``:302-305``) and crashes on fresh runs; here resume happens only when a
checkpoint exists.

Everything (params, optimizer state, step, epoch, rng key) lives in the
checkpointed pytree by construction, closing the reference's holes (the
Performer projection and MoE counters were never checkpointed,
``fast_attention.py:33-36``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True),
        )

    def save(self, step: int, state: Any, epoch: int,
             rng: Optional[Any] = None,
             extra: Optional[Dict[str, Any]] = None) -> None:
        # rng key data so resume continues the exact random stream. Key
        # width is impl-dependent (threefry (2,), rbg (4,)); store a fixed
        # 4-word buffer + the true width so the restore template is
        # shape-stable across TrainConfig.rng_impl choices.
        rng_data = np.zeros((4,), np.uint32)
        rng_width = 0
        if rng is not None:
            data = np.asarray(jax.random.key_data(rng)).ravel()
            rng_width = data.shape[0]
            assert rng_width in (2, 4), f"unknown key width {rng_width}"
            rng_data[:rng_width] = data
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
            "rng": rng_data,
            "rng_width": np.asarray(rng_width),
            "has_rng": np.asarray(rng is not None),
        }
        if getattr(state, "ema_params", None) is not None:
            payload["ema_params"] = state.ema_params
        if extra:
            payload.update(extra)
        payload = self._stage_to_host(payload, step)
        self._mngr.save(step, args=ocp.args.StandardSave(payload))

    @staticmethod
    def _stage_to_host(payload: Any, step: int) -> Any:
        """Device->host staging with a progress watchdog.

        orbax's save path streams the device arrays itself with no
        visibility; through a remote-chip tunnel whose download path can
        stall for multi-hour windows (BENCH_NOTES.md round-5) that wedges
        the train loop inside ``save()`` with no message. Staging the ONE
        device->host transfer here (a) names the stall on stderr every
        30 s instead of hanging silently, and (b) hands orbax pure-host
        arrays, so its async write is disk-only. Multi-process saves keep
        the orbax-native collective path (every process must contribute
        its addressable shards; a full ``device_get`` would need
        non-addressable ones).
        """
        if jax.process_count() > 1:
            return payload
        import sys
        import threading
        import time

        done = threading.Event()
        t0 = time.time()

        def beat():
            while not done.wait(30.0):
                print(f"[checkpoint] step {step}: device->host staging "
                      f"in flight {time.time() - t0:.0f}s (a long stall "
                      "here is the tunnel, not the chip)",
                      file=sys.stderr, flush=True)

        th = threading.Thread(target=beat, daemon=True)
        th.start()
        try:
            host = jax.device_get(payload)
        finally:
            done.set()
        dt = time.time() - t0
        if dt > 5.0:
            nbytes = sum(
                getattr(l, "nbytes", 0)
                for l in jax.tree_util.tree_leaves(host))
            print(f"[checkpoint] step {step}: staged "
                  f"{nbytes / 2**30:.2f} GiB to host in {dt:.0f}s "
                  f"({nbytes / max(dt, 1e-9) / 2**20:.1f} MB/s)",
                  file=sys.stderr, flush=True)
        return host

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    # -- epoch-completion sidecar -------------------------------------
    # A cadence save that lands exactly on an epoch's final step stores
    # the in-progress epoch; the trainer's end-of-epoch save at the same
    # step is then silently SKIPPED by orbax (duplicate step), so a
    # resume would re-run the whole completed epoch (the round-5 soak:
    # save_latest=512 aligned with a 512-step epoch, and the resumed run
    # trained 1536 steps where num_epochs promised 1024). The fix is a
    # tiny atomic JSON marker next to the checkpoints — not a second
    # multi-GiB save — recording "step S completed epoch E, resume at
    # E+1"; restore honors it only when it matches the restored step.

    def mark_epoch_complete(self, step: int, next_epoch: int) -> None:
        """Record that the checkpoint at ``step`` sits on an epoch
        boundary and a resume should start at ``next_epoch``. One entry
        per step (explicit restores to EARLIER boundary checkpoints
        resolve too). Primary process only; crash-safe (tmp + rename):
        losing the marker just falls back to the bounded one-epoch
        replay."""
        if jax.process_index() != 0:
            return
        path = os.path.join(self.directory, "epoch_meta.json")
        meta = self._read_epoch_meta()
        meta[str(int(step))] = int(next_epoch)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, path)

    def _read_epoch_meta(self) -> Dict[str, int]:
        try:
            with open(os.path.join(self.directory, "epoch_meta.json")) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            return {}
        # legacy single-entry layout {"step": S, "next_epoch": E}
        if "step" in meta and "next_epoch" in meta:
            return {str(int(meta["step"])): int(meta["next_epoch"])}
        return {str(k): int(v) for k, v in meta.items()}

    def _epoch_override(self, step: int, epoch: int) -> int:
        return max(epoch, self._read_epoch_meta().get(str(step), epoch))

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore into the shape of ``state_template``; returns
        (state, epoch) or (state, epoch, rng) via :meth:`restore_with_rng`,
        or None if no checkpoint exists."""
        out = self.restore_with_rng(state_template, step)
        if out is None:
            return None
        state, epoch, _ = out
        return state, epoch

    def restore_with_rng(self, state_template: Any,
                         step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        def template(rng_shape, with_width, with_ema):
            t = {
                "params": state_template.params,
                "opt_state": state_template.opt_state,
                "step": np.asarray(state_template.step),
                "epoch": np.asarray(0),
                "rng": np.zeros(rng_shape, np.uint32),
                "has_rng": np.asarray(False),
            }
            if with_width:
                t["rng_width"] = np.asarray(0)
            if with_ema:
                # the EMA tree mirrors the 'params' collection — derive a
                # template from it even when the live template carries no
                # EMA (a run trained WITH ema restored with ema off)
                t["ema_params"] = (
                    getattr(state_template, "ema_params", None)
                    or {"params": state_template.params["params"]})
            return t

        # Template variants, tried in order: orbax rejects structurally
        # mismatched templates, and a fresh manager's item_metadata is
        # None so the layout can't be sniffed up front.
        # - with/without "ema_params" (runs trained with ema_decay > 0)
        # - legacy: checkpoints written before the fixed-width rng buffer
        #   store "rng" at its natural (2,) threefry width, no "rng_width"
        restored = None
        errors = []
        # try the layout matching the LIVE template's EMA setting first:
        # the common non-EMA resume then succeeds on attempt one instead of
        # paying a guaranteed-failing with-EMA restore
        if getattr(state_template, "ema_params", None) is not None:
            variants = (((4,), True, True), ((4,), True, False),
                        ((2,), False, False))
        else:
            variants = (((4,), True, False), ((4,), True, True),
                        ((2,), False, False))
        for rng_shape, with_width, with_ema in variants:
            try:
                restored = self._mngr.restore(
                    step, args=ocp.args.StandardRestore(
                        template(rng_shape, with_width, with_ema)))
                break
            except (ValueError, KeyError) as e:
                errors.append(
                    f"[ema={with_ema} rng_width={with_width}] "
                    f"{type(e).__name__}: {e}")
                continue
        if restored is None:
            # surface every variant's underlying orbax error: a genuine
            # structural mismatch (changed model shape, added lr schedule
            # -> new opt_state leaf, ...) must not become an opaque
            # "no known layout"
            detail = "\n  ".join(errors)
            raise ValueError(
                f"checkpoint at step {step} matches no known layout; the "
                f"restore template likely diverged from the saved run "
                f"(changed model/optimizer flags on resume?). Per-layout "
                f"errors:\n  {detail}") from None
        new_ema = getattr(state_template, "ema_params", None)
        if new_ema is not None:
            if "ema_params" in restored:
                # resuming an EMA run: take the saved EMA
                new_ema = restored["ema_params"]
            else:
                # checkpoint predates EMA: seed from the restored weights
                # (a COPY — the donated train step may not see the same
                # buffer twice)
                new_ema = {"params": jax.tree_util.tree_map(
                    jax.numpy.copy, restored["params"]["params"])}
        elif "ema_params" in restored:
            print(f"[checkpoint] WARNING: checkpoint at step {step} carries "
                  "EMA weights but the current config has ema_decay=0 — the "
                  "EMA weights are DROPPED and subsequent checkpoints will "
                  "not contain them. Resume with --ema_decay to keep them, "
                  "or evaluate this checkpoint with --use_ema first.")
        state = state_template.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
            ema_params=new_ema)
        rng = None
        if bool(restored.get("has_rng", False)):
            data = np.asarray(restored["rng"]).ravel()
            width = int(restored.get("rng_width", 0)) or data.shape[0]
            # impl follows the stored key width (threefry=2 words, rbg=4)
            impl = "threefry2x32" if width == 2 else "rbg"
            rng = jax.random.wrap_key_data(
                jax.numpy.asarray(data[:width]), impl=impl)
        epoch = self._epoch_override(step, int(restored["epoch"]))
        return state, epoch, rng

    def close(self) -> None:
        self._mngr.close()
