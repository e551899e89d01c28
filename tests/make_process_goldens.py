"""Golden fixtures for the feature-extraction pipeline (process_file).

The reference's ``process_file`` reads module-level globals that only its
dataset-prep ``__main__`` block defines (``motion_process.py:421-436``) —
they are injected here before calling. A smooth synthetic motion is built by
FK of small random joint rotations over a drifting root so the IK inside
process_file stays well-conditioned.

Usage: python tests/make_process_goldens.py
"""

import os
import sys

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference/text2motion")


def synthesize_motion(T=24, seed=3):
    """Plausible t2m joints [T, 22, 3] via FK of smooth small rotations."""
    sys.path.insert(0, REFERENCE)
    import torch
    from utils import paramUtil
    from utils.skeleton import Skeleton

    rng = np.random.default_rng(seed)
    skel = Skeleton(torch.from_numpy(
        paramUtil.t2m_raw_offsets.astype(np.float32)),
        paramUtil.t2m_kinematic_chain, "cpu")
    # human-ish reference pose: walk each kinematic chain placing children
    # at parent + 0.3 * unit offset direction (all bones length 0.3)
    ref_joints = np.zeros((22, 3), np.float32)
    for chain in paramUtil.t2m_kinematic_chain:
        for a, b in zip(chain[:-1], chain[1:]):
            ref_joints[b] = ref_joints[a] + \
                0.3 * paramUtil.t2m_raw_offsets[b].astype(np.float32)
    skel.get_offsets_joints(torch.from_numpy(ref_joints))

    # smooth small-angle quaternions around identity per joint
    angles = np.cumsum(rng.standard_normal((T, 22, 3)) * 0.02, axis=0)
    w = np.cos(np.linalg.norm(angles, axis=-1, keepdims=True) / 2)
    xyz = angles * 0.5  # small-angle approx
    quat = np.concatenate([w, xyz], axis=-1)
    quat = quat / np.linalg.norm(quat, axis=-1, keepdims=True)

    root = np.stack([np.linspace(0, 0.5, T),
                     np.full(T, 0.9) + 0.01 * rng.standard_normal(T),
                     np.linspace(0, 1.0, T)], axis=-1).astype(np.float32)
    joints = skel.forward_kinematics_np(quat.astype(np.float32), root)
    return np.asarray(joints, dtype=np.float32)


def main() -> None:
    sys.path.insert(0, REFERENCE)
    import torch
    from utils import paramUtil
    from utils import motion_process as mp
    from utils.skeleton import Skeleton

    # the reference's foot_detect uses the np.float alias removed in
    # numpy>=1.24 (motion_process.py:50,58) — restore it for the run
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]

    # inject the t2m __main__ globals (motion_process.py:423-439)
    mp.l_idx1, mp.l_idx2 = 5, 8
    mp.fid_r, mp.fid_l = [8, 11], [7, 10]
    mp.face_joint_indx = [2, 1, 17, 16]
    mp.r_hip, mp.l_hip = 2, 1
    mp.joints_num = 22
    mp.n_raw_offsets = torch.from_numpy(
        paramUtil.t2m_raw_offsets.astype(np.float32))
    mp.kinematic_chain = paramUtil.t2m_kinematic_chain

    joints = synthesize_motion()
    tgt_skel = Skeleton(mp.n_raw_offsets, mp.kinematic_chain, "cpu")
    tgt_offsets = tgt_skel.get_offsets_joints(torch.from_numpy(joints[0]))
    mp.tgt_offsets = tgt_offsets

    data, ground_positions, positions, l_velocity = mp.process_file(
        joints.copy(), 0.002)

    out = {
        "joints": joints,
        "tgt_offsets": tgt_offsets.numpy(),
        "features": data.astype(np.float32),
        "ground_positions": np.asarray(ground_positions, np.float32),
        "l_velocity": np.asarray(l_velocity, np.float32),
    }
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "process_goldens.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: features {data.shape}")


if __name__ == "__main__":
    main()
