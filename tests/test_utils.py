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


class TestSoakReport:
    """tools/soak_report.py: parse train-CLI logs into the soak summary."""

    def _fake_log(self, tmp_path, name, rows):
        lines = []
        for ep, it, t, loss in rows:
            mm, ss = divmod(int(t), 60)
            lines.append(
                f"epoch: {ep:3d} niter: {it:07d} time: {mm}m {ss:02d}s "
                f"grad_norm: 0.5 loss_moe: 0.30 loss_mot_rec: 1.0 "
                f"loss_total: {loss:.4f}")
        p = tmp_path / name
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_two_half_soak_summary(self, tmp_path):
        from motiondiffusion_moe_tpu.tools.soak_report import (
            parse_log, summarize)

        h1 = self._fake_log(tmp_path, "a.log",
                            [(0, 10, 700, 1.33), (0, 160, 900, 1.20),
                             (1, 320, 1100, 1.10), (1, 350, 1140, 1.08)])
        # resume rolls back to the step-320 checkpoint and replays
        h2 = self._fake_log(tmp_path, "b.log",
                            [(1, 330, 650, 1.09), (2, 480, 850, 1.01),
                             (4, 640, 1100, 0.95)])
        halves = [parse_log(h1), parse_log(h2)]
        assert len(halves[0]) == 4 and len(halves[1]) == 3
        assert halves[0][0] == {"epoch": 0, "step": 10,
                                "elapsed_s": 700.0, "loss": 1.33}
        s = summarize(halves)
        assert s["total_steps"] == 640
        assert s["monotonic_steps"] and s["loss_decreasing"]
        assert s["resume_step_continues"] and s["resume_loss_continues"]
        # 340 steps over 440 s then 310 over 450
        assert s["sustained_steps_per_s"][0] == pytest.approx(340 / 440)
        assert s["sustained_steps_per_s"][1] == pytest.approx(310 / 450)

    def test_reset_to_zero_is_not_a_resume(self, tmp_path):
        from motiondiffusion_moe_tpu.tools.soak_report import (
            parse_log, summarize)

        h1 = self._fake_log(tmp_path, "a.log",
                            [(0, 100, 700, 1.2), (1, 300, 900, 1.1)])
        h2 = self._fake_log(tmp_path, "b.log",
                            [(0, 10, 650, 1.33), (0, 200, 850, 1.2)])
        s = summarize([parse_log(h1), parse_log(h2)])
        assert not s["resume_step_continues"]
