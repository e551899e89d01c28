"""Text-to-motion datasets (host-side, numpy).

Capability match of ``text2motion/datasets1/dataset1.py:11-164``
(``Text2MotionDataset``): HumanML3D/KIT-ML directory layout, length
filtering, ``caption#tokens#f_tag#to_tag`` annotation parsing with sub-clip
cropping, the ``times`` duplication multiplier, random-crop/zero-pad to
``max_motion_length``, and feat_bias z-normalization.

Torch-free: plain-python Dataset protocol (__len__/__getitem__) consumed by
:mod:`loader`. A synthetic dataset provides deterministic fake data for
tests and benchmarks.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from motiondiffusion_moe_tpu.config import DataConfig
from motiondiffusion_moe_tpu.data.normalizer import MotionNormalizer


@dataclass
class TextAnnotation:
    caption: str
    tokens: List[str]
    f_tag: float
    to_tag: float


def parse_text_annotation(line: str) -> TextAnnotation:
    """Parse one ``caption#tokens#f_tag#to_tag`` line
    (``dataset1.py:42-49``)."""
    parts = line.strip().split("#")
    caption = parts[0]
    tokens = parts[1].split(" ") if len(parts) > 1 else []
    f_tag = float(parts[2]) if len(parts) > 2 else 0.0
    to_tag = float(parts[3]) if len(parts) > 3 else 0.0
    f_tag = 0.0 if np.isnan(f_tag) else f_tag
    to_tag = 0.0 if np.isnan(to_tag) else to_tag
    return TextAnnotation(caption, tokens, f_tag, to_tag)


class Text2MotionDataset:
    """HumanML3D / KIT-ML training dataset.

    Directory layout (same as the reference's ``opt.motion_dir`` /
    ``opt.text_dir``):

        <data_root>/new_joint_vecs/<id>.npy   [T, dim_pose] features
        <data_root>/texts/<id>.txt            annotation lines
        <data_root>/<split>.txt               ids, one per line

    Returns ``(caption, motion[max_len, D] normalized, m_length)``.
    """

    def __init__(self, cfg: DataConfig, split: str = "train",
                 normalizer: Optional[MotionNormalizer] = None,
                 times: Optional[int] = None,
                 seed: int = 0,
                 use_native: Optional[bool] = None):
        self.cfg = cfg
        self.times = times if times is not None else cfg.times
        self.rng = random.Random(seed)

        motion_dir = os.path.join(cfg.data_root, "new_joint_vecs")
        text_dir = os.path.join(cfg.data_root, "texts")
        split_file = os.path.join(cfg.data_root, f"{split}.txt")

        with open(split_file) as f:
            id_list = [line.strip() for line in f if line.strip()]

        data_dict: Dict[str, dict] = {}
        new_name_list: List[str] = []
        length_list: List[int] = []
        min_len = cfg.min_motion_length

        for name in id_list:
            try:
                motion = np.load(os.path.join(motion_dir, name + ".npy"))
            except (FileNotFoundError, OSError):
                continue  # some motions are missing in KIT (dataset1.py:75-77)
            if len(motion) < min_len or len(motion) >= 200:
                continue
            text_data: List[TextAnnotation] = []
            flag = False
            try:
                with open(os.path.join(text_dir, name + ".txt")) as f:
                    lines = f.readlines()
            except (FileNotFoundError, OSError):
                continue
            for line in lines:
                if not line.strip():
                    continue
                ann = parse_text_annotation(line)
                if ann.f_tag == 0.0 and ann.to_tag == 0.0:
                    flag = True
                    text_data.append(ann)
                else:
                    # sub-clip at 20 fps (dataset1.py:56-67)
                    n_motion = motion[int(ann.f_tag * 20): int(ann.to_tag * 20)]
                    if len(n_motion) < min_len or len(n_motion) >= 200:
                        continue
                    new_name = f"{self.rng.choice('ABCDEFGHIJKLMNOPQRSTUVW')}_{name}"
                    while new_name in data_dict:
                        new_name = f"{self.rng.choice('ABCDEFGHIJKLMNOPQRSTUVW')}_{name}"
                    data_dict[new_name] = {"motion": n_motion,
                                           "length": len(n_motion),
                                           "text": [ann]}
                    new_name_list.append(new_name)
                    length_list.append(len(n_motion))
            if flag:
                data_dict[name] = {"motion": motion, "length": len(motion),
                                   "text": text_data}
                new_name_list.append(name)
                length_list.append(len(motion))

        if not new_name_list:
            raise FileNotFoundError(
                f"no usable motions under {cfg.data_root} (split {split})")

        pairs = sorted(zip(new_name_list, length_list), key=lambda x: x[1])
        self.name_list = [p[0] for p in pairs]
        self.length_arr = np.array([p[1] for p in pairs])
        self.data_dict = data_dict

        if normalizer is None:
            all_frames = np.concatenate(
                [d["motion"] for d in data_dict.values()], axis=0)
            mean = all_frames.mean(axis=0)
            std = MotionNormalizer.apply_feat_bias(
                all_frames.std(axis=0), cfg.num_joints, cfg.feat_bias)
            normalizer = MotionNormalizer(mean, std)
        self.normalizer = normalizer

        # native (C++) batch assembly: register raw motions once, then
        # crop+pad+normalize per batch in GIL-free threads (data/native.py)
        self._store = None
        self._native_idx: Dict[str, int] = {}
        if use_native if use_native is not None else cfg.use_native_io:
            try:
                from motiondiffusion_moe_tpu.data import native as native_mod
                if native_mod.native_available():
                    store = native_mod.NativeMotionStore()
                    for name in self.name_list:
                        self._native_idx[name] = store.add_array(
                            self.data_dict[name]["motion"])
                    self._store = store
            except Exception:
                self._store = None

    @property
    def has_native(self) -> bool:
        return self._store is not None

    def get_batch(self, indices: List[int], seed: int
                  ) -> Tuple[List[str], np.ndarray, np.ndarray]:
        """Assemble (captions, motions[B, max_len, D], lengths[B]) natively.

        Caption choice stays in Python (cheap, shares ``self.rng`` with the
        per-item path); motion crop/pad/normalize runs in C++ threads with
        crops drawn deterministically from ``seed``. Falls back to the
        per-item Python path when the shared library is unavailable.
        """
        if self._store is None:
            from motiondiffusion_moe_tpu.data.loader import collate
            return collate([self[i] for i in indices])
        captions: List[str] = []
        store_idx: List[int] = []
        for item in indices:
            idx = item % self.real_len()
            name = self.name_list[idx]
            captions.append(self.rng.choice(self.data_dict[name]["text"]).caption)
            store_idx.append(self._native_idx[name])
        motions, lengths = self._store.assemble_batch(
            store_idx, self.cfg.max_motion_length,
            self.normalizer.mean, self.normalizer.std, seed=seed)
        return captions, motions, lengths

    # ------------------------------------------------------------------
    def real_len(self) -> int:
        return len(self.data_dict)

    def __len__(self) -> int:
        return self.real_len() * self.times

    def __getitem__(self, item: int) -> Tuple[str, np.ndarray, int]:
        idx = item % self.real_len()
        data = self.data_dict[self.name_list[idx]]
        motion, m_length = data["motion"], data["length"]
        caption = self.rng.choice(data["text"]).caption

        max_len = self.cfg.max_motion_length
        if m_length >= max_len:
            start = self.rng.randint(0, len(motion) - max_len)
            motion = motion[start: start + max_len]
            m_length = max_len
        else:
            pad = np.zeros((max_len - m_length, motion.shape[1]),
                           dtype=motion.dtype)
            motion = np.concatenate([motion, pad], axis=0)

        motion = self.normalizer.normalize_np(motion).astype(np.float32)
        return caption, motion, m_length


_VERBS = ["walks", "runs", "jumps", "turns", "waves", "sits", "kicks",
          "dances", "crouches", "stretches"]
_MODS = ["slowly", "quickly", "in a circle", "forward", "backward",
         "to the left", "to the right", "twice", "with both arms", "in place"]


class SyntheticText2MotionDataset:
    """Deterministic synthetic dataset shaped like HumanML3D.

    Motions are smooth random walks in feature space with plausible lengths
    in [min_len, 199]; captions are procedural "a person <verb> <modifier>".
    Used by tests and benchmarks (the real datasets require licensed files).
    """

    def __init__(self, cfg: DataConfig, size: int = 256, seed: int = 0):
        self.cfg = cfg
        self.size = size
        self.seed = seed
        self.normalizer = MotionNormalizer.identity(cfg.dim_pose)

    def real_len(self) -> int:
        return self.size

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, item: int) -> Tuple[str, np.ndarray, int]:
        rng = np.random.default_rng(self.seed * 100003 + item)
        cfg = self.cfg
        m_length = int(rng.integers(cfg.min_motion_length,
                                    min(200, cfg.max_motion_length + 1)))
        steps = rng.standard_normal((m_length, cfg.dim_pose)).astype(np.float32)
        motion = np.cumsum(steps * 0.05, axis=0)
        caption = (f"a person {_VERBS[int(rng.integers(len(_VERBS)))]} "
                   f"{_MODS[int(rng.integers(len(_MODS)))]}")
        max_len = cfg.max_motion_length
        if m_length < max_len:
            motion = np.concatenate(
                [motion, np.zeros((max_len - m_length, cfg.dim_pose),
                                  np.float32)], axis=0)
        else:
            motion = motion[:max_len]
            m_length = max_len
        return caption, motion, m_length
