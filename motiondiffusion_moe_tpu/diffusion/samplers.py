"""Timestep schedule samplers.

Capability match of ``text2motion/models/gaussian_diffusion.py:77-257``:
uniform, loss-second-moment resampling, and EMA-based adaptive sampling.

Design notes (TPU-first):
- Sampling and the loss-history state live on the HOST (tiny [T]-vectors,
  numpy), exactly as in the reference — the sampled ``t`` batch is fed into
  the jitted train step as a device array. This keeps data-dependent
  reweighting out of the compiled graph.
- The reference's ``update_with_local_losses`` does a cross-rank
  ``dist.all_gather`` of (t, loss) pairs (``:139-165``; a dead path there
  because the trainer hardcodes 'uniform', ``trainers/ddpm_trainer.py:41``).
  Here the per-host gather is a ``jax.experimental.multihost_utils``
  process_allgather when running multi-host, exposed via
  ``update_with_local_losses``; single-host it is a no-op passthrough.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Tuple

import numpy as np


class ScheduleSampler(ABC):
    """Distribution over diffusion timesteps (importance sampling)."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    @abstractmethod
    def weights(self) -> np.ndarray:
        """Positive, not-necessarily-normalized weights, one per step."""

    def sample(self, batch_size: int,
               rng: np.random.Generator | None = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Importance-sample (timesteps, loss-weights) for a batch.

        Mirrors ``ScheduleSampler.sample`` (``gaussian_diffusion.py:108-123``).
        """
        rng = rng or np.random.default_rng()
        w = self.weights()
        p = w / np.sum(w)
        indices = rng.choice(len(p), size=(batch_size,), p=p)
        weights = 1.0 / (len(p) * p[indices])
        return indices.astype(np.int32), weights.astype(np.float32)


class UniformSampler(ScheduleSampler):
    def __init__(self, num_timesteps: int):
        super().__init__(num_timesteps)
        self._weights = np.ones([num_timesteps], dtype=np.float64)

    def weights(self) -> np.ndarray:
        return self._weights


class LossAwareSampler(ScheduleSampler):
    """Base for loss-adaptive samplers (``gaussian_diffusion.py:135-173``)."""

    def update_with_local_losses(self, local_ts: np.ndarray,
                                 local_losses: np.ndarray) -> None:
        """Gather (t, loss) pairs across hosts, then update.

        Multi-host: uses ``multihost_utils.process_allgather`` (the XLA
        analog of the reference's ``dist.all_gather``, ``:139-165``).
        Single-host (the common case): passthrough.
        """
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            all_ts = multihost_utils.process_allgather(np.asarray(local_ts))
            all_losses = multihost_utils.process_allgather(np.asarray(local_losses))
            self.update_with_all_losses(all_ts.reshape(-1), all_losses.reshape(-1))
        else:
            self.update_with_all_losses(np.asarray(local_ts),
                                        np.asarray(local_losses))

    @abstractmethod
    def update_with_all_losses(self, ts: np.ndarray, losses: np.ndarray) -> None:
        ...


class LossSecondMomentResampler(LossAwareSampler):
    """p(t) ~ sqrt(E[loss^2]) with a 10-deep history per term
    (``gaussian_diffusion.py:175-212``)."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        super().__init__(num_timesteps)
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros([num_timesteps, history_per_term],
                                      dtype=np.float64)
        self._loss_counts = np.zeros([num_timesteps], dtype=np.int64)

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones([self.num_timesteps], dtype=np.float64)
        weights = np.sqrt(np.mean(self._loss_history ** 2, axis=-1))
        weights /= np.sum(weights)
        weights *= 1 - self.uniform_prob
        weights += self.uniform_prob / len(weights)
        return weights

    def update_with_all_losses(self, ts, losses) -> None:
        for t, loss in zip(np.asarray(ts).tolist(), np.asarray(losses).tolist()):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())


class AdaptiveLossSampler(LossAwareSampler):
    """EMA-of-squared-losses sampler with warmup
    (``gaussian_diffusion.py:215-257``)."""

    def __init__(self, num_timesteps: int, alpha: float = 0.9,
                 uniform_prob: float = 0.001, warmup_ratio: float = 0.2):
        super().__init__(num_timesteps)
        self.alpha = alpha
        self.uniform_prob = uniform_prob
        self.warmup_cutoff = int(num_timesteps * warmup_ratio)
        self.ema_losses = np.zeros([num_timesteps], dtype=np.float64)
        self.ema_counts = np.zeros([num_timesteps], dtype=np.float64)
        self._step_count = 0

    def weights(self) -> np.ndarray:
        if self._step_count < self.warmup_cutoff:
            return np.ones([self.num_timesteps], dtype=np.float64)
        w = np.sqrt(self.ema_losses / np.maximum(self.ema_counts, 1e-8))
        w = w / (w.sum() + 1e-8)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        return w

    def update_with_all_losses(self, ts, losses) -> None:
        self._step_count += 1
        for t, loss in zip(np.asarray(ts).tolist(), np.asarray(losses).tolist()):
            sq = loss ** 2
            self.ema_counts[t] = self.alpha * self.ema_counts[t] + (1 - self.alpha)
            self.ema_losses[t] = self.alpha * self.ema_losses[t] + (1 - self.alpha) * sq


def create_named_schedule_sampler(name: str, num_timesteps: int) -> ScheduleSampler:
    """Factory mirroring ``create_named_schedule_sampler``
    (``gaussian_diffusion.py:77-90``)."""
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    if name in ("adaptive-loss", "adaptive"):
        return AdaptiveLossSampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
