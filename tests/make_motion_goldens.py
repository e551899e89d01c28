"""Generate golden fixtures from the reference motion/quaternion code.

Writes ``tests/fixtures/motion_goldens.npz``. Run once where the reference
is mounted; the npz is committed. See make_goldens.py for the rationale.

Usage: python tests/make_motion_goldens.py
"""

import os
import sys

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference/text2motion")


def main() -> None:
    sys.path.insert(0, REFERENCE)
    import torch
    from utils import paramUtil
    from utils.motion_process import recover_from_ric, recover_from_rot, recover_root_rot_pos
    from utils.quaternion import (
        qmul, qrot, qinv, qbetween, qeuler, euler2quat, expmap_to_quaternion,
        quaternion_to_matrix, quaternion_to_cont6d, cont6d_to_matrix, qfix)
    from utils.skeleton import Skeleton

    rng = np.random.default_rng(42)
    out = {}

    # quaternion ops on random (normalized) quats
    q = rng.standard_normal((5, 7, 4)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    r = rng.standard_normal((5, 7, 4)).astype(np.float32)
    r = r / np.linalg.norm(r, axis=-1, keepdims=True)
    v = rng.standard_normal((5, 7, 3)).astype(np.float32)
    out["q"], out["r"], out["v"] = q, r, v
    tq, tr, tv = map(torch.from_numpy, (q, r, v))
    out["qmul"] = qmul(tq, tr).numpy()
    out["qrot"] = qrot(tq, tv).numpy()
    out["qinv"] = qinv(tq).numpy()
    out["qbetween"] = qbetween(tv, torch.from_numpy(
        rng.standard_normal((5, 7, 3)).astype(np.float32) + 0.1)).numpy()
    # regenerate the second arg deterministically
    rng2 = np.random.default_rng(43)
    v2 = rng2.standard_normal((5, 7, 3)).astype(np.float32)
    out["v2"] = v2
    out["qbetween"] = qbetween(tv, torch.from_numpy(v2)).numpy()
    out["q2mat"] = quaternion_to_matrix(tq).numpy()
    out["q2cont6d"] = quaternion_to_cont6d(tq).numpy()
    c6 = rng.standard_normal((5, 7, 6)).astype(np.float32)
    out["cont6d"] = c6
    out["cont6d2mat"] = cont6d_to_matrix(torch.from_numpy(c6)).numpy()
    e = rng.uniform(-180, 180, (5, 7, 3)).astype(np.float32)
    out["euler"] = e
    out["euler2quat_xyz"] = euler2quat(torch.from_numpy(e), "xyz").numpy()
    out["qeuler_xyz"] = qeuler(tq, "xyz").numpy()
    em = rng.standard_normal((5, 7, 3)).astype(np.float32)
    out["expmap"] = em
    out["expmap2quat"] = expmap_to_quaternion(em)
    qseq = rng.standard_normal((9, 3, 4)).astype(np.float32)
    out["qseq"] = qseq
    out["qfix"] = qfix(qseq)

    # recover_from_ric on synthetic 263-dim features (t2m, 22 joints)
    J = 22
    D = 1 + 2 + 1 + (J - 1) * 3 + (J - 1) * 6 + J * 3 + 4
    assert D == 263
    feats = (rng.standard_normal((2, 16, D)) * 0.1).astype(np.float32)
    out["feats_t2m"] = feats
    tf = torch.from_numpy(feats)
    rq, rp = recover_root_rot_pos(tf)
    out["root_quat"], out["root_pos"] = rq.numpy(), rp.numpy()
    out["ric_joints"] = recover_from_ric(tf, J).numpy()

    # recover_from_rot needs a skeleton with offsets
    skel = Skeleton(torch.from_numpy(paramUtil.t2m_raw_offsets.astype(np.float32)),
                    paramUtil.t2m_kinematic_chain, "cpu")
    ref_joints = rng.standard_normal((J, 3)).astype(np.float32)
    out["ref_joints"] = ref_joints
    skel.get_offsets_joints(torch.from_numpy(ref_joints))
    out["skel_offsets"] = skel.offset().numpy()
    # NOTE: the reference's recover_from_rot flattens cont6d params to
    # (-1, J, 6) but not root_pos, so it only works unbatched [T, D]
    # (motion_process.py:384-398) — golden generated on one sequence.
    out["rot_joints"] = recover_from_rot(tf[0], J, skel).numpy()

    # FK goldens
    quat_params = rng.standard_normal((4, J, 4)).astype(np.float32)
    quat_params /= np.linalg.norm(quat_params, axis=-1, keepdims=True)
    root_pos = rng.standard_normal((4, 3)).astype(np.float32)
    out["fk_quat_params"], out["fk_root_pos"] = quat_params, root_pos
    out["fk_joints"] = skel.forward_kinematics(
        torch.from_numpy(quat_params), torch.from_numpy(root_pos)).numpy()
    c6p = rng.standard_normal((4, J, 6)).astype(np.float32)
    out["fk_cont6d_params"] = c6p
    out["fk_cont6d_joints"] = skel.forward_kinematics_cont6d(
        torch.from_numpy(c6p), torch.from_numpy(root_pos)).numpy()

    # IK golden (on FK output for consistency)
    joints_seq = out["fk_joints"].astype(np.float64)
    # NOTE: batch must not be 3 — the reference's qbetween calls torch.cross
    # without dim (quaternion.py:394), which grabs the FIRST size-3 dim; a
    # 3-frame batch makes it cross over frames instead of coordinates.
    out["ik_quat"] = skel.inverse_kinematics_np(joints_seq, [2, 1, 17, 16])

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "motion_goldens.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} with {len(out)} arrays")


if __name__ == "__main__":
    main()
