"""Logging facade + checkpoint utility tests."""

import json
import os

import numpy as np

from dilabhelmholtzoct_tpu.utils.logging import (
    JsonlLogger,
    MultiLogger,
    StdoutLogger,
    make_logger,
)


def test_jsonl_logger_roundtrip(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lg = JsonlLogger(path)
    lg.log({"train/train_loss": 1.5, "train/epoch": 0})
    lg.log({"val/valid_loss": np.float32(2.5)})  # numpy scalars coerced
    lg.log({"skipme": object(), "ok": 1})        # non-scalars dropped
    lg.finish()
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["train/train_loss"] == 1.5
    assert recs[1]["val/valid_loss"] == 2.5
    assert "skipme" not in recs[2] and recs[2]["ok"] == 1


def test_make_logger_composition(tmp_path, capsys):
    lg = make_logger(jsonl_path=str(tmp_path / "x.jsonl"), use_wandb=True)
    # wandb missing → degrades gracefully, stdout + jsonl still work
    lg.log({"train/train_loss": 0.25})
    lg.log_images("train_samples", ["a.png"])
    lg.finish()
    out = capsys.readouterr().out
    assert "train/train_loss" in out
    assert os.path.exists(tmp_path / "x.jsonl")


def test_checkpoint_latest_step(tmp_path):
    from dilabhelmholtzoct_tpu.utils.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )

    d = str(tmp_path / "ck")
    assert latest_step(d) is None
    state = {"w": np.arange(4.0), "epoch": 3}
    save_checkpoint(d, 3, state)
    save_checkpoint(d, 7, {"w": np.ones(4), "epoch": 7})
    assert latest_step(d) == 7
    restored, step = restore_checkpoint(d, target=state)
    assert step == 7
    np.testing.assert_array_equal(restored["w"], np.ones(4))


def test_step_timer():
    from dilabhelmholtzoct_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(5):
        with t:
            pass
    s = t.summary()
    # the first (compile) step is excluded from BOTH the count and the
    # percentiles, consistently
    assert s["perf/steps"] == 4
    assert s["perf/step_ms_p50"] >= 0


def test_step_timer_single_step_reports_no_percentiles():
    """A 1-step epoch must not report the compile step as p50."""
    from dilabhelmholtzoct_tpu.utils.profiling import StepTimer

    t = StepTimer()
    with t:
        pass
    s = t.summary()
    assert s == {"perf/steps": 0}


def test_checkpoint_retention(tmp_path):
    from dilabhelmholtzoct_tpu.utils.checkpoint import (
        latest_step,
        save_checkpoint,
    )

    d = str(tmp_path / "ckr")
    for step in range(5):
        save_checkpoint(d, step, {"w": np.full(3, float(step))}, keep=2)
    import os

    kept = sorted(x for x in os.listdir(d) if x.startswith("step_"))
    assert kept == ["step_3", "step_4"]
    assert latest_step(d) == 4


def test_str2bool_strict():
    import pytest as _pytest

    from dilabhelmholtzoct_tpu.train.cli import _str2bool

    assert _str2bool("True") and _str2bool("1") and _str2bool("yes")
    for v in ("false", "f", "no", "n", "off", "0", " False "):
        assert _str2bool(v) is False, v
    import argparse

    with _pytest.raises(argparse.ArgumentTypeError):
        _str2bool("maybe")


def test_stdout_logger_numpy_scalars(capsys):
    from dilabhelmholtzoct_tpu.utils.logging import StdoutLogger

    StdoutLogger().log({"loss": np.float32(0.5), "name": "run", "o": object()})
    out = capsys.readouterr().out
    assert '"loss": 0.5' in out and '"name": "run"' in out
    assert '"o": "<obj>"' in out
