"""Golden parity tests for quaternion algebra, skeleton FK/IK, and the
motion feature decoder (recover_from_ric / recover_from_rot)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.motion import (
    Skeleton,
    T2M_KINEMATIC_CHAIN,
    T2M_RAW_OFFSETS,
    cont6d_to_matrix,
    euler2quat,
    expmap_to_quaternion,
    qbetween,
    qeuler,
    qfix,
    qinv,
    qmul,
    qrot,
    quaternion_to_cont6d,
    quaternion_to_matrix,
    recover_from_ric,
    recover_from_rot,
    recover_root_rot_pos,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "motion_goldens.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(FIXTURES)


class TestQuaternionGoldens:
    def test_qmul(self, g):
        np.testing.assert_allclose(
            np.asarray(qmul(jnp.asarray(g["q"]), jnp.asarray(g["r"]))),
            g["qmul"], atol=1e-5)

    def test_qrot(self, g):
        np.testing.assert_allclose(
            np.asarray(qrot(jnp.asarray(g["q"]), jnp.asarray(g["v"]))),
            g["qrot"], atol=1e-5)

    def test_qinv(self, g):
        np.testing.assert_allclose(
            np.asarray(qinv(jnp.asarray(g["q"]))), g["qinv"], atol=1e-7)

    def test_qbetween(self, g):
        np.testing.assert_allclose(
            np.asarray(qbetween(jnp.asarray(g["v"]), jnp.asarray(g["v2"]))),
            g["qbetween"], atol=1e-4)

    def test_quaternion_to_matrix(self, g):
        np.testing.assert_allclose(
            np.asarray(quaternion_to_matrix(jnp.asarray(g["q"]))),
            g["q2mat"], atol=1e-5)

    def test_quaternion_to_cont6d(self, g):
        np.testing.assert_allclose(
            np.asarray(quaternion_to_cont6d(jnp.asarray(g["q"]))),
            g["q2cont6d"], atol=1e-5)

    def test_cont6d_to_matrix(self, g):
        np.testing.assert_allclose(
            np.asarray(cont6d_to_matrix(jnp.asarray(g["cont6d"]))),
            g["cont6d2mat"], atol=1e-5)

    def test_euler2quat(self, g):
        np.testing.assert_allclose(
            np.asarray(euler2quat(jnp.asarray(g["euler"]), "xyz")),
            g["euler2quat_xyz"], atol=1e-5)

    def test_qeuler(self, g):
        np.testing.assert_allclose(
            np.asarray(qeuler(jnp.asarray(g["q"]), "xyz")),
            g["qeuler_xyz"], atol=1e-3)

    def test_expmap(self, g):
        np.testing.assert_allclose(
            np.asarray(expmap_to_quaternion(jnp.asarray(g["expmap"]))),
            g["expmap2quat"], atol=1e-5)

    def test_qfix(self, g):
        np.testing.assert_allclose(qfix(g["qseq"]), g["qfix"], atol=0)

    def test_rotation_roundtrip(self, g):
        """qrot by q then by qinv(q) is identity for unit quaternions."""
        q = jnp.asarray(g["q"])
        v = jnp.asarray(g["v"])
        np.testing.assert_allclose(np.asarray(qrot(qinv(q), qrot(q, v))),
                                   np.asarray(v), atol=1e-4)


class TestSkeleton:
    @pytest.fixture(scope="class")
    def skel(self, g):
        s = Skeleton(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN)
        s.get_offsets_joints(jnp.asarray(g["ref_joints"]))
        return s

    def test_offsets_golden(self, skel, g):
        np.testing.assert_allclose(np.asarray(skel.offset()),
                                   g["skel_offsets"], atol=1e-5)

    def test_fk_quat_golden(self, skel, g):
        joints = skel.forward_kinematics(jnp.asarray(g["fk_quat_params"]),
                                         jnp.asarray(g["fk_root_pos"]))
        np.testing.assert_allclose(np.asarray(joints), g["fk_joints"],
                                   atol=1e-4)

    def test_fk_cont6d_golden(self, skel, g):
        joints = skel.forward_kinematics_cont6d(
            jnp.asarray(g["fk_cont6d_params"]), jnp.asarray(g["fk_root_pos"]))
        np.testing.assert_allclose(np.asarray(joints), g["fk_cont6d_joints"],
                                   atol=1e-4)

    def test_ik_golden(self, skel, g):
        quat = skel.inverse_kinematics(g["fk_joints"], [2, 1, 17, 16])
        np.testing.assert_allclose(quat, g["ik_quat"], atol=1e-3)

    def test_fk_jits(self, skel, g):
        fk = jax.jit(skel.forward_kinematics_cont6d)
        joints = fk(jnp.asarray(g["fk_cont6d_params"]),
                    jnp.asarray(g["fk_root_pos"]))
        np.testing.assert_allclose(np.asarray(joints), g["fk_cont6d_joints"],
                                   atol=1e-4)


class TestRecover:
    def test_root_rot_pos_golden(self, g):
        rq, rp = recover_root_rot_pos(jnp.asarray(g["feats_t2m"]))
        np.testing.assert_allclose(np.asarray(rq), g["root_quat"], atol=1e-5)
        np.testing.assert_allclose(np.asarray(rp), g["root_pos"], atol=1e-5)

    def test_recover_from_ric_golden(self, g):
        joints = recover_from_ric(jnp.asarray(g["feats_t2m"]), 22)
        assert joints.shape == (2, 16, 22, 3)
        np.testing.assert_allclose(np.asarray(joints), g["ric_joints"],
                                   atol=1e-5)

    def test_recover_from_rot_golden(self, g):
        skel = Skeleton(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN)
        skel.set_offset(g["skel_offsets"])
        joints = recover_from_rot(jnp.asarray(g["feats_t2m"][0]), 22, skel)
        np.testing.assert_allclose(np.asarray(joints), g["rot_joints"],
                                   atol=1e-4)

    def test_recover_batched_consistent(self, g):
        """Batched recover equals per-sequence recover (the reference can
        only do the latter for recover_from_rot)."""
        feats = jnp.asarray(g["feats_t2m"])
        batched = recover_from_ric(feats, 22)
        per_seq = jnp.stack([recover_from_ric(feats[i], 22) for i in range(2)])
        np.testing.assert_allclose(np.asarray(batched), np.asarray(per_seq),
                                   atol=1e-6)

    def test_recover_jit_vmap(self, g):
        feats = jnp.asarray(g["feats_t2m"])
        fn = jax.jit(jax.vmap(lambda f: recover_from_ric(f, 22)))
        np.testing.assert_allclose(np.asarray(fn(feats)), g["ric_joints"],
                                   atol=1e-5)

    def test_recover_grad_flows(self, g):
        """recover_from_ric is differentiable (needed for the structure /
        physics-prior losses that operate in joint space)."""
        feats = jnp.asarray(g["feats_t2m"])
        grad = jax.grad(lambda f: recover_from_ric(f, 22).sum())(feats)
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).sum()) > 0
