"""Raw joints -> 263/251-dim motion features (dataset construction).

Capability match of ``text2motion/utils/motion_process.py:13-351``
(``uniform_skeleton``, ``extract_features``, ``process_file``) — the encoder
side of the motion codec whose decoder is :mod:`recover`. Host-side
numpy-facing API over the jnp quaternion/skeleton math (this runs once per
clip at dataset-build time, not in the training hot path).

Dataset constants (``motion_process.py:421-515`` __main__ blocks):
t2m : lower legs (5, 8), feet r [8, 11] / l [7, 10], face [2, 1, 17, 16],
      feet_thre 0.002, 20 fps
kit : lower legs (17, 18), feet r [14, 15] / l [19, 20],
      face [11, 16, 5, 8], feet_thre 0.05, 12.5 fps
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from motiondiffusion_moe_tpu.motion.params import (
    KIT_KINEMATIC_CHAIN,
    KIT_RAW_OFFSETS,
    T2M_KINEMATIC_CHAIN,
    T2M_RAW_OFFSETS,
)
from motiondiffusion_moe_tpu.motion.quaternion import (
    qfix,
    qbetween,
    qinv,
    qmul,
    qrot,
    quaternion_to_cont6d,
)
from motiondiffusion_moe_tpu.motion.skeleton import Skeleton


@dataclass(frozen=True)
class ProcessConfig:
    """Per-dataset constants for feature extraction."""

    raw_offsets: np.ndarray
    kinematic_chain: List[List[int]]
    l_idx: Tuple[int, int]          # lower legs (scale reference)
    fid_r: Tuple[int, int]          # right foot joints
    fid_l: Tuple[int, int]          # left foot joints
    face_joint_indx: Tuple[int, int, int, int]
    feet_thre: float
    joints_num: int

    @staticmethod
    def t2m() -> "ProcessConfig":
        return ProcessConfig(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN,
                             (5, 8), (8, 11), (7, 10), (2, 1, 17, 16),
                             0.002, 22)

    @staticmethod
    def kit() -> "ProcessConfig":
        return ProcessConfig(KIT_RAW_OFFSETS, KIT_KINEMATIC_CHAIN,
                             (17, 18), (14, 15), (19, 20), (11, 16, 5, 8),
                             0.05, 21)


def uniform_skeleton(positions: np.ndarray, target_offsets: np.ndarray,
                     cfg: ProcessConfig) -> np.ndarray:
    """Retarget a clip onto the canonical skeleton by leg-length scaling +
    IK/FK round-trip (``motion_process.py:13-36``)."""
    src_skel = Skeleton(cfg.raw_offsets, cfg.kinematic_chain)
    src_offset = np.asarray(
        src_skel.get_offsets_joints(jnp.asarray(positions[0])))
    tgt_offset = np.asarray(target_offsets)
    l1, l2 = cfg.l_idx
    src_leg_len = np.abs(src_offset[l1]).max() + np.abs(src_offset[l2]).max()
    tgt_leg_len = np.abs(tgt_offset[l1]).max() + np.abs(tgt_offset[l2]).max()
    scale_rt = tgt_leg_len / src_leg_len
    tgt_root_pos = positions[:, 0] * scale_rt

    quat_params = src_skel.inverse_kinematics(positions,
                                              list(cfg.face_joint_indx))
    src_skel.set_offset(target_offsets)
    new_joints = src_skel.forward_kinematics(
        jnp.asarray(quat_params, dtype=jnp.float32),
        jnp.asarray(tgt_root_pos, dtype=jnp.float32))
    return np.asarray(new_joints)


def _foot_detect(positions: np.ndarray, thres: float, fid_l, fid_r
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Foot-contact labels from squared foot velocity
    (``motion_process.py:42-60``)."""
    def contact(fid):
        d = positions[1:, list(fid)] - positions[:-1, list(fid)]
        speed_sq = (d ** 2).sum(-1)
        return (speed_sq < thres).astype(np.float32)

    return contact(fid_l), contact(fid_r)


def _get_cont6d_params(positions: np.ndarray, cfg: ProcessConfig):
    """(cont6d params, root angular velocity, root linear velocity in the
    facing frame, root rotation) (``motion_process.py:98-117``)."""
    skel = Skeleton(cfg.raw_offsets, cfg.kinematic_chain)
    quat_params = skel.inverse_kinematics(positions,
                                          list(cfg.face_joint_indx),
                                          smooth_forward=True)
    quat_params = qfix(quat_params.astype(np.float32))
    cont_6d = np.asarray(quaternion_to_cont6d(jnp.asarray(quat_params)))
    r_rot = quat_params[:, 0].copy()
    velocity = (positions[1:, 0] - positions[:-1, 0]).astype(np.float32)
    velocity = np.asarray(qrot(jnp.asarray(r_rot[1:]), jnp.asarray(velocity)))
    r_velocity = np.asarray(qmul(jnp.asarray(r_rot[1:]),
                                 qinv(jnp.asarray(r_rot[:-1]))))
    return cont_6d, r_velocity, velocity, r_rot


def _get_rifke(positions: np.ndarray, r_rot: np.ndarray) -> np.ndarray:
    """Root-relative, facing-aligned joint positions
    (``motion_process.py:69-76``)."""
    positions = positions.copy()
    positions[..., 0] -= positions[:, 0:1, 0]
    positions[..., 2] -= positions[:, 0:1, 2]
    rq = np.repeat(r_rot[:, None], positions.shape[1], axis=1)
    return np.asarray(qrot(jnp.asarray(rq), jnp.asarray(positions)))


def extract_features(positions: np.ndarray, cfg: ProcessConfig) -> np.ndarray:
    """[T, J, 3] world joints -> [T-1, D] feature vectors
    (``motion_process.py:39-166``). Layout:
    [rot_vel(1), lin_vel_xz(2), root_y(1), ric (J-1)*3, rot6d (J-1)*6,
    local_vel J*3, foot_contact(4)]."""
    positions = np.asarray(positions, dtype=np.float32)
    global_positions = positions.copy()

    feet_l, feet_r = _foot_detect(positions, cfg.feet_thre,
                                  cfg.fid_l, cfg.fid_r)

    cont_6d_params, r_velocity, velocity, r_rot = _get_cont6d_params(
        positions, cfg)
    positions = _get_rifke(positions, r_rot)

    root_y = positions[:, 0, 1:2]
    r_velocity = np.arcsin(np.clip(r_velocity[:, 2:3], -1.0, 1.0))
    l_velocity = velocity[:, [0, 2]]
    root_data = np.concatenate([r_velocity, l_velocity, root_y[:-1]], axis=-1)

    rot_data = cont_6d_params[:, 1:].reshape(len(cont_6d_params), -1)
    ric_data = positions[:, 1:].reshape(len(positions), -1)

    rq = np.repeat(r_rot[:-1, None], global_positions.shape[1], axis=1)
    local_vel = np.asarray(qrot(
        jnp.asarray(rq),
        jnp.asarray(global_positions[1:] - global_positions[:-1])))
    local_vel = local_vel.reshape(len(local_vel), -1)

    data = np.concatenate([root_data, ric_data[:-1], rot_data[:-1],
                           local_vel, feet_l, feet_r], axis=-1)
    return data.astype(np.float32)


def process_file(positions: np.ndarray, cfg: ProcessConfig,
                 target_offsets: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Full clip pipeline (``motion_process.py:169-351``): retarget, floor,
    origin, face Z+, then feature extraction. Returns
    (features [T-1, D], global_positions, rifke_positions, l_velocity)."""
    positions = np.asarray(positions, dtype=np.float32)

    # uniform_skeleton returns a (read-only) jnp-backed array; copy to a
    # writable host buffer for the in-place normalization below
    positions = np.array(uniform_skeleton(positions, target_offsets, cfg))

    # put on floor
    floor_height = positions.min(axis=0).min(axis=0)[1]
    positions[:, :, 1] -= floor_height

    # XZ at origin
    root_pos_init = positions[0]
    root_pose_init_xz = root_pos_init[0] * np.array([1, 0, 1],
                                                    dtype=np.float32)
    positions = positions - root_pose_init_xz

    # all initially face Z+
    r_hip, l_hip, sdr_r, sdr_l = cfg.face_joint_indx
    across = (root_pos_init[r_hip] - root_pos_init[l_hip]
              + root_pos_init[sdr_r] - root_pos_init[sdr_l])
    across = across / np.sqrt((across ** 2).sum())
    forward_init = np.cross(np.array([0.0, 1.0, 0.0], np.float32), across)
    forward_init = forward_init / np.sqrt((forward_init ** 2).sum())
    root_quat_init = np.asarray(qbetween(jnp.asarray(forward_init[None]),
                                         jnp.asarray([[0.0, 0.0, 1.0]])))
    rq = np.ones(positions.shape[:-1] + (4,), np.float32) * root_quat_init
    positions = np.asarray(qrot(jnp.asarray(rq), jnp.asarray(positions)))

    global_positions = positions.copy()
    data = extract_features(positions, cfg)

    # rifke positions + l_velocity returned for parity with the reference
    cont_6d, r_velocity, velocity, r_rot = _get_cont6d_params(positions, cfg)
    rifke = _get_rifke(positions, r_rot)
    return data, global_positions, rifke, velocity[:, [0, 2]]


def build_target_offsets(example_joints: np.ndarray,
                         cfg: ProcessConfig) -> np.ndarray:
    """Target skeleton offsets from the canonical example clip
    (``motion_process.py:440-446``)."""
    skel = Skeleton(cfg.raw_offsets, cfg.kinematic_chain)
    return np.asarray(skel.get_offsets_joints(jnp.asarray(example_joints[0])))
