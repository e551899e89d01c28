"""Motion feature normalization with the feat_bias scheme.

Capability match of ``text2motion/datasets1/dataset1.py:82-116``: z-norm
with the std of the root-velocity channels (0:4) and foot-contact channels
(last 4) divided by ``feat_bias`` (default 25) — amplifying those channels'
normalized magnitude — and the adjusted mean/std persisted to ``meta/``.

``normalize``/``denormalize`` are pure jnp and run on-device (BASELINE.json:
feature normalization as XLA-fused preprocessing); fitting happens host-side
in float64 at dataset-build time.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np


class MotionNormalizer:
    """Holds (mean, std) with the feat_bias adjustment applied."""

    def __init__(self, mean: np.ndarray, std: np.ndarray):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)
        self._mean_j = jnp.asarray(self.mean)
        self._std_j = jnp.asarray(self.std)

    # ------------------------------------------------------------------
    @staticmethod
    def fit(motions: np.ndarray, joints_num: int,
            feat_bias: float = 25.0) -> "MotionNormalizer":
        """Compute mean/std over all frames and apply the feat_bias scheme
        (``dataset1.py:84-104``). ``motions``: [N, D] stacked frames."""
        mean = motions.mean(axis=0).astype(np.float64)
        std = motions.std(axis=0).astype(np.float64)
        return MotionNormalizer(mean,
                                MotionNormalizer.apply_feat_bias(
                                    std, joints_num, feat_bias))

    @staticmethod
    def apply_feat_bias(std: np.ndarray, joints_num: int,
                        feat_bias: float) -> np.ndarray:
        """Divide root (0:4) and foot-contact (last 4) stds by feat_bias."""
        std = np.array(std, copy=True)
        j = joints_num
        std[0:4] = std[0:4] / feat_bias
        # ric (4 : 4+(j-1)*3), rot, local_vel: divided by 1.0 (unchanged)
        assert 4 + (j - 1) * 9 + j * 3 + 4 == std.shape[-1]
        std[4 + (j - 1) * 9 + j * 3:] = std[4 + (j - 1) * 9 + j * 3:] / feat_bias
        return std

    # ------------------------------------------------------------------
    def normalize(self, motion):
        return (motion - self._mean_j) / self._std_j

    def denormalize(self, motion):
        """``inv_transform`` (``dataset1.py:112-113``)."""
        return motion * self._std_j + self._mean_j

    def normalize_np(self, motion: np.ndarray) -> np.ndarray:
        return (motion - self.mean) / self.std

    def denormalize_np(self, motion: np.ndarray) -> np.ndarray:
        return motion * self.std + self.mean

    # ------------------------------------------------------------------
    def save(self, meta_dir: str) -> None:
        os.makedirs(meta_dir, exist_ok=True)
        np.save(os.path.join(meta_dir, "mean.npy"), self.mean)
        np.save(os.path.join(meta_dir, "std.npy"), self.std)

    @staticmethod
    def load(meta_dir: str) -> "MotionNormalizer":
        return MotionNormalizer(
            np.load(os.path.join(meta_dir, "mean.npy")),
            np.load(os.path.join(meta_dir, "std.npy")))

    @staticmethod
    def identity(dim: int) -> "MotionNormalizer":
        return MotionNormalizer(np.zeros(dim), np.ones(dim))
