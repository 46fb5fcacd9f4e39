"""Profiling/metrics utility tests."""

import json
import time

from posetraj_tpu.utils import MetricsLogger, StageTimer


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2
    assert t.totals["a"] >= 0.02
    assert "a: total" in t.report()


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(str(tmp_path), run_name="t")
    logger.log(1, {"loss": 0.5})
    logger.log(2, {"loss": 0.25, "lr": 1e-5})
    logger.close()
    lines = [json.loads(l) for l in open(logger.path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["lr"] == 1e-5
