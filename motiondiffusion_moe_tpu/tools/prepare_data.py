"""Dataset preparation CLI: raw joints -> training-ready feature dataset.

Capability match of the reference's dataset-prep drivers — the ``__main__``
blocks at ``text2motion/utils/motion_process.py:421-515`` (KIT live, t2m
commented above it): walk a directory of raw world-space joint clips
(``<id>.npy``, ``[T, J, 3]`` or ``[T, J*3]``), run ``process_file`` per
clip, verify each clip through the ``recover_from_ric`` round trip, and
emit the per-file 263/251-dim features plus recovered joints:

    <out_dir>/new_joint_vecs/<id>.npy   [T-1, D] features (training input)
    <out_dir>/new_joints/<id>.npy       [T-1, J, 3] recovered joints
    <out_dir>/Mean.npy, Std.npy         raw per-channel stats (reference
                                        naming, no feat_bias — the files
                                        ``tools/train.py:132-133`` loads)
    <out_dir>/meta/mean.npy, std.npy    feat_bias-adjusted stats
                                        (MotionNormalizer layout consumed
                                        by evaluate/visualize/serve)

Beyond the reference: the raw Mean/Std the reference expects from a
SEPARATE upstream script (the original HumanML3D ``cal_mean_variance``)
are computed here in the same pass, so this CLI alone takes a user from
raw AMASS/KIT joints to a ``Text2MotionDataset``-ready directory.

Usage::

    python -m motiondiffusion_moe_tpu.tools.prepare_data \
        --dataset t2m --joints_dir raw/joints --out_dir data/HumanML3D \
        --example_id 000021
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# per-dataset constants from the reference __main__ blocks
# (motion_process.py:421-446 t2m, :466-490 kit)
_DATASET = {
    "t2m": dict(example_id="000021", fps=20.0),
    "kit": dict(example_id="03950_gt", fps=12.5),
}


def _load_joints(path: str, joints_num: int) -> np.ndarray:
    """Load one raw clip as [T, joints_num, 3] (flat [T, J*3] accepted);
    extra joints beyond joints_num are dropped (``:451,497`` slice)."""
    arr = np.load(path)
    if arr.ndim == 2:
        arr = arr.reshape(len(arr), -1, 3)
    if arr.ndim != 3 or arr.shape[-1] != 3:
        raise ValueError(f"{path}: expected [T, J, 3] joints, got {arr.shape}")
    if arr.shape[1] < joints_num:
        raise ValueError(f"{path}: {arr.shape[1]} joints < {joints_num}")
    return np.asarray(arr[:, :joints_num], dtype=np.float32)


def _kit_rename(source_file: str) -> str:
    """KIT file-id munging (``motion_process.py:502``):
    ``03950_mmm_00.npy`` -> ``0395000.npy`` (strip the 7-char suffix,
    drop underscores)."""
    return "".join(source_file[:-7].split("_")) + ".npy"


def prepare_dataset(joints_dir: str, out_dir: str, dataset: str = "t2m",
                    example_id: str | None = None,
                    feat_bias: float = 25.0,
                    min_frames: int = 2) -> dict:
    """Run the full prep pipeline; returns a summary dict (clips kept /
    skipped, total frames). Pure host-side numpy — this runs once per
    dataset, not in the training hot path."""
    from motiondiffusion_moe_tpu.data.normalizer import MotionNormalizer
    from motiondiffusion_moe_tpu.motion import recover_from_ric
    from motiondiffusion_moe_tpu.motion.process import (
        ProcessConfig, build_target_offsets, process_file)

    if dataset not in _DATASET:
        raise ValueError(f"unknown dataset {dataset!r} (t2m | kit)")
    consts = _DATASET[dataset]
    cfg = ProcessConfig.t2m() if dataset == "t2m" else ProcessConfig.kit()
    example_id = example_id or consts["example_id"]

    # target skeleton offsets from the canonical example clip
    # (motion_process.py:440-446)
    example_path = os.path.join(joints_dir, example_id + ".npy")
    if not os.path.isfile(example_path):
        raise FileNotFoundError(
            f"example clip {example_path} not found — pass --example_id "
            "naming a clip that exists in --joints_dir (it defines the "
            "canonical target skeleton)")
    tgt_offsets = build_target_offsets(
        _load_joints(example_path, cfg.joints_num), cfg)

    vec_dir = os.path.join(out_dir, "new_joint_vecs")
    jnt_dir = os.path.join(out_dir, "new_joints")
    os.makedirs(vec_dir, exist_ok=True)
    os.makedirs(jnt_dir, exist_ok=True)

    kept, skipped, frame_num = [], [], 0
    # float64 running sums: one pass over every frame for Mean/Std
    d = None
    s1 = s2 = None

    source_list = sorted(f for f in os.listdir(joints_dir)
                         if f.endswith(".npy"))
    if not source_list:
        raise FileNotFoundError(f"no .npy clips under {joints_dir}")
    for source_file in source_list:
        name = _kit_rename(source_file) if dataset == "kit" else source_file
        try:
            joints = _load_joints(os.path.join(joints_dir, source_file),
                                  cfg.joints_num)
            if len(joints) < min_frames:
                raise ValueError(f"only {len(joints)} frames")
            data, _, _, _ = process_file(joints, cfg, tgt_offsets)
            # decode round trip is the per-clip sanity check the reference
            # applies to KIT (:503-506) — a NaN here means degenerate
            # geometry (e.g. zero-length bones) and the clip is dropped
            rec = np.asarray(recover_from_ric(data, cfg.joints_num))
            if not (np.isfinite(data).all() and np.isfinite(rec).all()):
                raise ValueError("non-finite features/recovered joints")
        except Exception as e:  # per-clip isolation (:457-460,507-510)
            skipped.append((source_file, str(e)))
            print(f"[prepare_data] skip {source_file}: {e}")
            continue
        np.save(os.path.join(vec_dir, name), data)
        np.save(os.path.join(jnt_dir, name), rec)
        frame_num += data.shape[0]
        if s1 is None:
            d = data.shape[-1]
            s1 = np.zeros(d, np.float64)
            s2 = np.zeros(d, np.float64)
        s1 += data.sum(axis=0, dtype=np.float64)
        s2 += (data.astype(np.float64) ** 2).sum(axis=0)
        kept.append(name)

    if not kept:
        raise RuntimeError("every clip failed processing — nothing to save")

    mean = s1 / frame_num
    var = np.maximum(s2 / frame_num - mean ** 2, 0.0)
    std = np.sqrt(var)
    # raw stats under the reference's names (loaded by tools/train.py:132)
    np.save(os.path.join(out_dir, "Mean.npy"), mean.astype(np.float32))
    np.save(os.path.join(out_dir, "Std.npy"), std.astype(np.float32))
    # feat_bias-adjusted normalizer (dataset1.py:84-104) under meta/
    MotionNormalizer(
        mean, MotionNormalizer.apply_feat_bias(
            std, cfg.joints_num, feat_bias)).save(
                os.path.join(out_dir, "meta"))

    minutes = frame_num / consts["fps"] / 60.0
    print(f"[prepare_data] {dataset}: {len(kept)} clips kept, "
          f"{len(skipped)} skipped, {frame_num} frames "
          f"({minutes:.1f} min @ {consts['fps']} fps) -> {out_dir}")
    return {"kept": len(kept), "skipped": len(skipped),
            "frames": frame_num, "dim": int(d)}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--dataset", default="t2m", choices=["t2m", "kit"])
    p.add_argument("--joints_dir", required=True,
                   help="directory of raw [T, J, 3] world-joint .npy clips")
    p.add_argument("--out_dir", required=True,
                   help="output dataset root (new_joint_vecs/, new_joints/,"
                        " Mean/Std, meta/)")
    p.add_argument("--example_id", default="",
                   help="clip id defining the canonical target skeleton "
                        "(default: the reference's per-dataset id)")
    p.add_argument("--feat_bias", type=float, default=25.0,
                   help="root/foot-contact std divisor (dataset1.py:84)")
    args = p.parse_args(argv)
    prepare_dataset(args.joints_dir, args.out_dir, args.dataset,
                    example_id=args.example_id or None,
                    feat_bias=args.feat_bias)


if __name__ == "__main__":
    main()
