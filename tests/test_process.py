"""Feature-extraction (process_file) golden parity tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.motion import recover_from_ric
from motiondiffusion_moe_tpu.motion.process import (
    ProcessConfig,
    build_target_offsets,
    extract_features,
    process_file,
    uniform_skeleton,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "process_goldens.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(FIXTURES)


class TestProcessFile:
    def test_features_golden(self, g):
        cfg = ProcessConfig.t2m()
        data, gp, rifke, l_vel = process_file(
            g["joints"].copy(), cfg, g["tgt_offsets"])
        assert data.shape == g["features"].shape == (23, 263)
        np.testing.assert_allclose(data, g["features"], atol=2e-3)

    def test_ground_positions_golden(self, g):
        cfg = ProcessConfig.t2m()
        _, gp, _, _ = process_file(g["joints"].copy(), cfg, g["tgt_offsets"])
        np.testing.assert_allclose(gp, g["ground_positions"], atol=2e-3)

    def test_l_velocity_golden(self, g):
        cfg = ProcessConfig.t2m()
        _, _, _, l_vel = process_file(g["joints"].copy(), cfg,
                                      g["tgt_offsets"])
        np.testing.assert_allclose(l_vel, g["l_velocity"], atol=2e-3)

    def test_codec_roundtrip(self, g):
        """encode (process_file) -> decode (recover_from_ric) reproduces the
        normalized ground positions — the end-to-end codec contract the
        reference relies on (motion_process.py:455-456)."""
        cfg = ProcessConfig.t2m()
        data, gp, _, _ = process_file(g["joints"].copy(), cfg,
                                      g["tgt_offsets"])
        rec = np.asarray(recover_from_ric(jnp.asarray(data), 22))
        np.testing.assert_allclose(rec, gp[:-1], atol=5e-3)

    def test_build_target_offsets(self, g):
        cfg = ProcessConfig.t2m()
        off = build_target_offsets(g["joints"], cfg)
        np.testing.assert_allclose(off, g["tgt_offsets"], atol=1e-5)

    def test_kit_config_shapes(self):
        """KIT config produces 251-dim features."""
        cfg = ProcessConfig.kit()
        D = 1 + 2 + 1 + 20 * 3 + 20 * 6 + 21 * 3 + 4
        assert D == 251
