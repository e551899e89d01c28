"""Dataset-prep CLI (tools/prepare_data.py): raw joints -> feature dataset.

Golden-tested against the committed process fixtures (the same clip the
process_file parity tests use), plus the full prepared-directory ->
Text2MotionDataset round trip the CLI exists to enable.
"""

import os

import numpy as np
import pytest

from motiondiffusion_moe_tpu.tools.prepare_data import (
    _kit_rename,
    main,
    prepare_dataset,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "process_goldens.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURES)


@pytest.fixture()
def joints_dir(tmp_path, golden):
    """Raw-joints dir: the golden clip as the canonical example, a second
    valid clip (noised copy), and one degenerate 1-frame clip."""
    d = tmp_path / "joints"
    d.mkdir()
    np.save(d / "000021.npy", golden["joints"])
    rng = np.random.default_rng(0)
    np.save(d / "000042.npy",
            golden["joints"] + rng.normal(0, 0.01, golden["joints"].shape)
            .astype(np.float32))
    np.save(d / "000099.npy", golden["joints"][:1])  # too short -> skipped
    return str(d)


class TestPrepareDataset:
    def test_features_match_process_goldens(self, joints_dir, tmp_path,
                                            golden):
        out = str(tmp_path / "out")
        summary = prepare_dataset(joints_dir, out, "t2m")
        assert summary == {"kept": 2, "skipped": 1, "frames": 46,
                           "dim": 263}
        feats = np.load(os.path.join(out, "new_joint_vecs", "000021.npy"))
        assert feats.shape == golden["features"].shape == (23, 263)
        np.testing.assert_allclose(feats, golden["features"], atol=2e-3)
        # recovered joints = the decode round trip of the features, which
        # the goldens pin to the (floored/faced) ground positions
        rec = np.load(os.path.join(out, "new_joints", "000021.npy"))
        np.testing.assert_allclose(rec, golden["ground_positions"][:-1],
                                   atol=5e-3)

    def test_stats_and_meta(self, joints_dir, tmp_path):
        from motiondiffusion_moe_tpu.data.normalizer import MotionNormalizer

        out = str(tmp_path / "out")
        prepare_dataset(joints_dir, out, "t2m")
        mean = np.load(os.path.join(out, "Mean.npy"))
        std = np.load(os.path.join(out, "Std.npy"))
        assert mean.shape == std.shape == (263,)
        # raw stats must equal the stacked-feature mean/std (no feat_bias)
        frames = np.concatenate([
            np.load(os.path.join(out, "new_joint_vecs", f))
            for f in sorted(os.listdir(os.path.join(out, "new_joint_vecs")))
        ])
        np.testing.assert_allclose(mean, frames.mean(0), rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(std, frames.std(0), rtol=1e-3, atol=1e-6)
        # meta/ is the feat_bias-adjusted MotionNormalizer layout
        norm = MotionNormalizer.load(os.path.join(out, "meta"))
        np.testing.assert_allclose(norm.mean, mean, rtol=1e-6)
        np.testing.assert_allclose(norm.std[0:4], std[0:4] / 25.0, rtol=1e-5)
        np.testing.assert_allclose(norm.std[-4:], std[-4:] / 25.0, rtol=1e-5)
        np.testing.assert_allclose(norm.std[4:-4], std[4:-4], rtol=1e-6)

    def test_prepared_dir_feeds_text2motion_dataset(self, joints_dir,
                                                    tmp_path):
        """The CLI's whole purpose: its output directory + texts/split
        files is a working Text2MotionDataset input."""
        from motiondiffusion_moe_tpu.config import DataConfig
        from motiondiffusion_moe_tpu.data import Text2MotionDataset

        out = tmp_path / "out"
        prepare_dataset(joints_dir, str(out), "t2m")
        (out / "texts").mkdir()
        for name in ("000021", "000042"):
            (out / "texts" / f"{name}.txt").write_text(
                "a person waves#a/DET person/NOUN wave/VERB#0.0#0.0\n")
        (out / "train.txt").write_text("000021\n000042\n")
        cfg = DataConfig(dataset_name="t2m", data_root=str(out),
                         dim_pose=263, num_joints=22,
                         max_motion_length=24, min_motion_length=8,
                         use_native_io=False)
        ds = Text2MotionDataset(cfg, split="train")
        assert len(ds) == 2
        caption, motion, length = ds[0]
        assert caption == "a person waves"
        assert motion.shape == (24, 263) and np.isfinite(motion).all()
        assert 8 <= length <= 24

    def test_kit_rename(self):
        assert _kit_rename("03950_mmm_00.npy") == "03950mmm.npy"
        assert _kit_rename("00017_mmm_01.npy") == "00017mmm.npy"

    def test_missing_example_raises(self, joints_dir, tmp_path):
        with pytest.raises(FileNotFoundError, match="example clip"):
            prepare_dataset(joints_dir, str(tmp_path / "o"), "t2m",
                            example_id="nope")

    def test_cli_main(self, joints_dir, tmp_path, capsys):
        out = str(tmp_path / "out")
        main(["--dataset", "t2m", "--joints_dir", joints_dir,
              "--out_dir", out])
        assert os.path.isfile(os.path.join(out, "Mean.npy"))
        assert "2 clips kept, 1 skipped" in capsys.readouterr().out
