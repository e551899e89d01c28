"""Native (C++) motionio data-plane tests."""

import os
import tempfile

import numpy as np
import pytest

from motiondiffusion_moe_tpu.data.native import (
    NativeMotionStore,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native motionio not built")


@pytest.fixture()
def store():
    return NativeMotionStore()


class TestNpyLoading:
    def test_f32_roundtrip(self, store):
        a = np.random.default_rng(0).standard_normal((17, 8)).astype(np.float32)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "a.npy")
            np.save(path, a)
            i = store.add_file(path)
        assert store.item_length(i) == 17
        out, lens = store.assemble_batch([i], 17, np.zeros(8, np.float32),
                                         np.ones(8, np.float32))
        np.testing.assert_allclose(out[0], a, atol=1e-7)

    def test_f64_converted(self, store):
        a = np.random.default_rng(1).standard_normal((9, 4))
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "b.npy")
            np.save(path, a)
            i = store.add_file(path)
        out, _ = store.assemble_batch([i], 9, np.zeros(4, np.float32),
                                      np.ones(4, np.float32))
        np.testing.assert_allclose(out[0], a.astype(np.float32), atol=1e-7)

    def test_missing_file_raises(self, store):
        with pytest.raises(IOError):
            store.add_file("/nonexistent/x.npy")


class TestBatchAssembly:
    def test_pad_and_lengths(self, store):
        m = np.ones((10, 4), np.float32)
        i = store.add_array(m)
        out, lens = store.assemble_batch([i], 16, np.zeros(4, np.float32),
                                         np.ones(4, np.float32))
        assert lens[0] == 10
        assert (out[0, :10] == 1).all()
        assert (out[0, 10:] == 0).all()

    def test_crop_window_valid(self, store):
        m = np.arange(30, dtype=np.float32)[:, None].repeat(4, 1)
        i = store.add_array(m)
        out, lens = store.assemble_batch([i] * 16, 8, np.zeros(4, np.float32),
                                         np.ones(4, np.float32), seed=5)
        assert (lens == 8).all()
        # each row must be a contiguous window of the source
        for b in range(16):
            start = out[b, 0, 0]
            np.testing.assert_allclose(out[b, :, 0],
                                       start + np.arange(8), atol=0)
            assert 0 <= start <= 22

    def test_normalization_matches_numpy(self, store):
        rng = np.random.default_rng(2)
        m = rng.standard_normal((20, 6)).astype(np.float32)
        mean = m.mean(0)
        std = m.std(0) + 0.1
        i = store.add_array(m)
        out, _ = store.assemble_batch([i], 20, mean, std)
        np.testing.assert_allclose(out[0], (m - mean) / std, atol=1e-5)

    def test_deterministic_per_seed(self, store):
        m = np.random.default_rng(3).standard_normal((50, 4)).astype(np.float32)
        i = store.add_array(m)
        z = np.zeros(4, np.float32)
        o = np.ones(4, np.float32)
        a, _ = store.assemble_batch([i] * 4, 16, z, o, seed=9)
        b, _ = store.assemble_batch([i] * 4, 16, z, o, seed=9)
        c, _ = store.assemble_batch([i] * 4, 16, z, o, seed=10)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_bad_index_raises(self, store):
        with pytest.raises(ValueError):
            store.assemble_batch([99], 8, np.zeros(4, np.float32),
                                 np.ones(4, np.float32))

    def test_multithreaded_consistent(self, store):
        m = np.random.default_rng(4).standard_normal((60, 8)).astype(np.float32)
        i = store.add_array(m)
        z, o = np.zeros(8, np.float32), np.ones(8, np.float32)
        a, _ = store.assemble_batch([i] * 32, 24, z, o, seed=1, num_threads=1)
        b, _ = store.assemble_batch([i] * 32, 24, z, o, seed=1, num_threads=8)
        np.testing.assert_array_equal(a, b)
