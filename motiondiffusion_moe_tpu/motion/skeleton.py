"""Skeleton forward/inverse kinematics in JAX.

Capability match of ``text2motion/utils/skeleton.py:4-194``. The chain walk
is over STATIC Python lists of joint indices (<=22 joints), so under jit it
unrolls into a fixed dataflow graph of qmul/qrot ops — no dynamic control
flow, fully fusable by XLA. Joint positions are accumulated functionally
(list -> stack) instead of the reference's in-place tensor writes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Rotation-chain matmuls are 3x3 and precision-critical: TPU's default
# bf16 matmul precision injects ~1e-3 error per link, which compounds along
# kinematic chains. Force full float32 MXU passes for geometry.
_HI = jax.lax.Precision.HIGHEST

from motiondiffusion_moe_tpu.motion.quaternion import (
    cont6d_to_matrix,
    qbetween,
    qinv,
    qmul,
    qrot,
)


class Skeleton:
    """Kinematic-tree FK/IK (``skeleton.py:4-194``).

    ``raw_offsets``: [J, 3] unit bone directions; ``kinematic_tree``: list of
    root-first index chains. Offsets are host-side constants; all FK math is
    jnp and batch-first ([B, J, ...]).
    """

    def __init__(self, raw_offsets: np.ndarray,
                 kinematic_tree: Sequence[Sequence[int]]):
        self._raw_offset = np.asarray(raw_offsets, dtype=np.float32)
        self._kinematic_tree = [list(c) for c in kinematic_tree]
        self._offset: Optional[jnp.ndarray] = None
        self._parents = [0] * len(self._raw_offset)
        self._parents[0] = -1
        for chain in self._kinematic_tree:
            for j in range(1, len(chain)):
                self._parents[chain[j]] = chain[j - 1]

    # ------------------------------------------------------------------
    @property
    def njoints(self) -> int:
        return len(self._raw_offset)

    @property
    def kinematic_tree(self) -> List[List[int]]:
        return self._kinematic_tree

    @property
    def parents(self) -> List[int]:
        return self._parents

    def offset(self) -> Optional[jnp.ndarray]:
        return self._offset

    def set_offset(self, offsets) -> None:
        self._offset = jnp.asarray(offsets, dtype=jnp.float32)

    # ------------------------------------------------------------------
    def get_offsets_joints(self, joints: jnp.ndarray) -> jnp.ndarray:
        """Bone-length-scaled offsets from one reference pose [J, 3]
        (``skeleton.py:42-50``)."""
        assert joints.ndim == 2
        lengths = [jnp.asarray(1.0)]
        for i in range(1, self.njoints):
            lengths.append(jnp.linalg.norm(joints[i] - joints[self._parents[i]]))
        scale = jnp.stack(lengths)[:, None]
        offsets = jnp.asarray(self._raw_offset) * scale
        offsets = offsets.at[0].set(joints[0] * 0)
        self._offset = offsets
        return offsets

    def get_offsets_joints_batch(self, joints: jnp.ndarray) -> jnp.ndarray:
        """Batch variant [B, J, 3] (``skeleton.py:32-39``)."""
        assert joints.ndim == 3
        diffs = joints[:, 1:] - joints[:, [self._parents[i] for i in range(1, self.njoints)]]
        lengths = jnp.linalg.norm(diffs, axis=-1)  # [B, J-1]
        lengths = jnp.concatenate(
            [jnp.zeros((joints.shape[0], 1), lengths.dtype), lengths], axis=1)
        offsets = lengths[..., None] * jnp.asarray(self._raw_offset)[None]
        self._offset = offsets
        return offsets

    # ------------------------------------------------------------------
    def _resolve_offsets(self, batch: int,
                         skel_joints: Optional[jnp.ndarray]) -> jnp.ndarray:
        if skel_joints is not None:
            offsets = self.get_offsets_joints_batch(skel_joints)
        else:
            assert self._offset is not None, "call set_offset/get_offsets_joints first"
            offsets = self._offset
        if offsets.ndim == 2:
            offsets = jnp.broadcast_to(offsets[None], (batch,) + offsets.shape)
        return offsets

    def forward_kinematics(self, quat_params: jnp.ndarray,
                           root_pos: jnp.ndarray,
                           skel_joints: Optional[jnp.ndarray] = None,
                           do_root_R: bool = True) -> jnp.ndarray:
        """Quaternion FK: [B, J, 4] local rotations + [B, 3] root position
        -> [B, J, 3] joints (``skeleton.py:104-123``)."""
        b = quat_params.shape[0]
        offsets = self._resolve_offsets(b, skel_joints)
        joints: List[Optional[jnp.ndarray]] = [None] * self.njoints
        joints[0] = root_pos
        for chain in self._kinematic_tree:
            if do_root_R:
                R = quat_params[:, 0]
            else:
                R = jnp.broadcast_to(
                    jnp.asarray([1.0, 0.0, 0.0, 0.0], quat_params.dtype), (b, 4))
            for i in range(1, len(chain)):
                R = qmul(R, quat_params[:, chain[i]])
                joints[chain[i]] = qrot(R, offsets[:, chain[i]]) + joints[chain[i - 1]]
        return jnp.stack(joints, axis=1)

    def forward_kinematics_cont6d(self, cont6d_params: jnp.ndarray,
                                  root_pos: jnp.ndarray,
                                  skel_joints: Optional[jnp.ndarray] = None,
                                  do_root_R: bool = True) -> jnp.ndarray:
        """Cont6d FK: [B, J, 6] + [B, 3] -> [B, J, 3]
        (``skeleton.py:174-194``)."""
        b = cont6d_params.shape[0]
        offsets = self._resolve_offsets(b, skel_joints)
        joints: List[Optional[jnp.ndarray]] = [None] * self.njoints
        joints[0] = root_pos
        for chain in self._kinematic_tree:
            if do_root_R:
                matR = cont6d_to_matrix(cont6d_params[:, 0])
            else:
                matR = jnp.broadcast_to(jnp.eye(3, dtype=cont6d_params.dtype),
                                        (b, 3, 3))
            for i in range(1, len(chain)):
                matR = jnp.matmul(matR, cont6d_to_matrix(cont6d_params[:, chain[i]]),
                                  precision=_HI)
                offset_vec = offsets[:, chain[i]][..., None]
                joints[chain[i]] = (jnp.matmul(matR, offset_vec, precision=_HI)[..., 0]
                                    + joints[chain[i - 1]])
        return jnp.stack(joints, axis=1)

    # ------------------------------------------------------------------
    def inverse_kinematics(self, joints: np.ndarray,
                           face_joint_idx: Sequence[int],
                           smooth_forward: bool = False) -> np.ndarray:
        """Joints [T, J, 3] -> local quaternions [T, J, 4]
        (``skeleton.py:55-101``). Host-side (dataset preprocessing);
        numpy in/out, jnp math."""
        assert len(face_joint_idx) == 4
        joints = jnp.asarray(joints, dtype=jnp.float32)
        l_hip, r_hip, sdr_r, sdr_l = face_joint_idx
        across = (joints[:, r_hip] - joints[:, l_hip]
                  + joints[:, sdr_r] - joints[:, sdr_l])
        across = across / jnp.linalg.norm(across, axis=-1, keepdims=True)

        forward = jnp.cross(jnp.asarray([[0.0, 1.0, 0.0]]), across)
        if smooth_forward:
            from scipy.ndimage import gaussian_filter1d
            forward = jnp.asarray(gaussian_filter1d(
                np.asarray(forward), 20, axis=0, mode="nearest"))
        forward = forward / jnp.linalg.norm(forward, axis=-1, keepdims=True)

        target = jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]]), forward.shape)
        root_quat = qbetween(forward, target)
        root_quat = root_quat.at[0].set(jnp.asarray([1.0, 0.0, 0.0, 0.0]))

        quat_params = jnp.zeros(joints.shape[:-1] + (4,))
        quat_params = quat_params.at[:, 0].set(root_quat)
        for chain in self._kinematic_tree:
            R = root_quat
            for j in range(len(chain) - 1):
                u = jnp.broadcast_to(
                    jnp.asarray(self._raw_offset[chain[j + 1]])[None],
                    (joints.shape[0], 3))
                v = joints[:, chain[j + 1]] - joints[:, chain[j]]
                v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
                rot_u_v = qbetween(u, v)
                R_loc = qmul(qinv(R), rot_u_v)
                quat_params = quat_params.at[:, chain[j + 1]].set(R_loc)
                R = qmul(R, R_loc)
        return np.asarray(quat_params)
