"""On-device motion feature decoding (263/251-dim -> 3D joints).

Capability match of ``text2motion/utils/motion_process.py:362-416``. The
feature layout (``motion_process.py:355-361``):

    [0]                  root rotation velocity (Y-axis)
    [1:3]                root linear velocity (XZ, root-relative frame)
    [3]                  root height (Y)
    [4 : 4+(J-1)*3]      rotation-invariant joint coordinates (ric)
    [... : +(J-1)*6]     cont6d local rotations
    [... : +J*3]         local joint velocities
    [-4:]                foot contacts

All functions are batch-agnostic over leading dims, jit/vmap-compatible, and
run on device — BASELINE.json requires recover_from_ric XLA-fused as part of
the sampling pipeline. The reference's in-place tensor writes become masked
builds; the time cumsums stay exact cumsums (XLA lowers them to efficient
scans).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from motiondiffusion_moe_tpu.motion.quaternion import (
    qinv,
    qrot,
    quaternion_to_cont6d,
)
from motiondiffusion_moe_tpu.motion.skeleton import Skeleton


def recover_root_rot_pos(data: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integrate root yaw velocity and XZ velocity into a root trajectory.

    ``motion_process.py:362-381``: the yaw angle at frame t is the cumsum of
    the PREVIOUS frames' rotation velocities (shifted by one); likewise the
    XZ position integrates previous-frame velocities rotated into the world
    frame. Returns (r_rot_quat [..., T, 4], r_pos [..., T, 3]).
    """
    rot_vel = data[..., 0]
    # r_rot_ang[t] = sum_{s<t} rot_vel[s]
    shifted = jnp.concatenate(
        [jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], axis=-1)
    r_rot_ang = jnp.cumsum(shifted, axis=-1)

    zeros = jnp.zeros_like(r_rot_ang)
    r_rot_quat = jnp.stack(
        [jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], axis=-1)

    # previous-frame XZ velocity, world-rotated, integrated
    vel_xz = data[..., 1:3]
    vel_xz = jnp.concatenate(
        [jnp.zeros_like(vel_xz[..., :1, :]), vel_xz[..., :-1, :]], axis=-2)
    r_vel = jnp.stack(
        [vel_xz[..., 0], jnp.zeros_like(vel_xz[..., 0]), vel_xz[..., 1]],
        axis=-1)
    r_vel = qrot(qinv(r_rot_quat), r_vel)
    r_pos = jnp.cumsum(r_vel, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])
    return r_rot_quat, r_pos


def recover_from_ric(data: jnp.ndarray, joints_num: int) -> jnp.ndarray:
    """Feature vectors [..., T, D] -> world joints [..., T, J, 3]
    (``motion_process.py:401-416``)."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4:(joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))

    # undo the root yaw on every local joint
    q = jnp.broadcast_to(qinv(r_rot_quat)[..., None, :],
                         positions.shape[:-1] + (4,))
    positions = qrot(q, positions)

    # add root XZ trajectory
    positions = positions.at[..., 0].add(r_pos[..., 0:1])
    positions = positions.at[..., 2].add(r_pos[..., 2:3])

    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


def recover_from_rot(data: jnp.ndarray, joints_num: int,
                     skeleton: Skeleton) -> jnp.ndarray:
    """Decode via the cont6d rotations + FK instead of the ric coordinates
    (``motion_process.py:384-398``). ``data`` must be [T, D] or [B*T, D]-
    flattenable; returns [N, J, 3] like the reference's view(-1, J, ...)."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    r_rot_cont6d = quaternion_to_cont6d(r_rot_quat)

    start = 1 + 2 + 1 + (joints_num - 1) * 3
    end = start + (joints_num - 1) * 6
    cont6d_params = data[..., start:end]
    cont6d_params = jnp.concatenate([r_rot_cont6d, cont6d_params], axis=-1)
    cont6d_params = cont6d_params.reshape(-1, joints_num, 6)
    return skeleton.forward_kinematics_cont6d(
        cont6d_params, r_pos.reshape(-1, 3))
