"""Aux subsystem tests: profiling, NaN detection, logging."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.utils import (
    MetricsLogger,
    StepTimer,
    annotate,
    assert_finite_tree,
    check_finite,
    checked,
)


class TestDebugging:
    def test_checked_passes_finite(self):
        @checked
        def f(x):
            check_finite(x, "x")
            return x * 2

        out = f(jnp.ones(3))
        np.testing.assert_allclose(np.asarray(out), 2.0)

    def test_checked_raises_on_nan(self):
        @checked
        def f(x):
            y = jnp.log(x)  # NaN for negative x
            check_finite(y, "log(x)")
            return y

        with pytest.raises(Exception, match="non-finite"):
            f(jnp.asarray([-1.0]))

    def test_checked_composes_with_jit(self):
        from jax.experimental import checkify

        def f(x):
            check_finite(x, "x")
            return x + 1

        cf = checkify.checkify(f)
        jcf = jax.jit(cf)
        err, out = jcf(jnp.ones(3))
        checkify.check_error(err)  # no raise
        err, _ = jcf(jnp.asarray([jnp.nan]))
        with pytest.raises(Exception):
            checkify.check_error(err)

    def test_assert_finite_tree(self):
        good = {"a": np.ones(3), "b": {"c": np.zeros(2)}}
        assert_finite_tree(good)
        bad = {"a": np.ones(3), "b": {"c": np.asarray([1.0, np.nan])}}
        with pytest.raises(FloatingPointError, match="b.*c"):
            assert_finite_tree(bad, "params")


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer(warmup=1)
        for _ in range(5):
            with t:
                _ = sum(range(1000))
        s = t.summary()
        assert s["steps"] == 4
        assert s["p95_s"] >= s["p50_s"] >= 0

    def test_annotate_runs(self):
        with annotate("test_region"):
            _ = jnp.ones(3) + 1


class TestLogging:
    def test_metrics_logger_jsonl(self, tmp_path):
        import json
        import time

        path = str(tmp_path / "log.jsonl")
        logger = MetricsLogger(log_every=2, jsonl_path=path)
        t0 = time.time()
        logger.log(1, 0, {"loss": 1.0}, t0)
        logger.log(2, 0, {"loss": 3.0}, t0)
        logger.log(3, 0, {"loss": 5.0}, t0)
        logger.log(4, 0, {"loss": 7.0}, t0)
        with open(path) as f:
            records = [json.loads(line) for line in f]
        assert len(records) == 2
        assert records[0]["loss"] == 2.0  # mean of 1, 3
        assert records[1]["loss"] == 6.0  # mean of 5, 7
