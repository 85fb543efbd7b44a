"""ScalarLogger (jsonl + TensorBoard) and emergency checkpointing."""

import glob
import json
import os
import signal

import pytest

from rangeldm_tpu.training.loggers import ScalarLogger, emergency_checkpoint


def test_scalar_logger_jsonl_and_tensorboard(tmp_path):
    lg = ScalarLogger(str(tmp_path), tensorboard=True)
    lg.log(1, {"loss": 0.5, "lr": 1e-4})
    lg.log(2, {"loss": 0.25})
    lg.close()
    lines = [json.loads(x) for x in
             open(tmp_path / "train_log.jsonl").read().splitlines()]
    assert lines[0] == {"loss": 0.5, "lr": 1e-4, "step": 1}
    assert lines[1]["loss"] == 0.25
    events = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert events and os.path.getsize(events[0]) > 0


def test_emergency_checkpoint_on_exception():
    saved = []
    with pytest.raises(RuntimeError):
        with emergency_checkpoint(lambda: saved.append(1), signum=None):
            raise RuntimeError("boom")
    assert saved == [1]


def test_emergency_checkpoint_on_sigusr1():
    saved = []
    with emergency_checkpoint(lambda: saved.append(1)):
        os.kill(os.getpid(), signal.SIGUSR1)
    assert saved == [1]


def test_emergency_checkpoint_no_save_on_success():
    saved = []
    with emergency_checkpoint(lambda: saved.append(1), signum=None):
        pass
    assert saved == []
