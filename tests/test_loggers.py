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


def test_scalar_logger_csv_sink(tmp_path):
    """Lightning-CSVLogger-style metrics.csv (vae/main.py:668-709 CSV
    logger option): header = union of keys, rewritten when a new metric
    appears mid-run; earlier rows get empty cells for the new column."""
    import csv
    lg = ScalarLogger(str(tmp_path), tensorboard=False, csv=True)
    lg.log(1, {"loss": 0.5})
    lg.log(2, {"loss": 0.25, "lr": 1e-4})   # new key -> header rewrite
    lg.log(3, {"loss": 0.125})
    lg.close()
    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["step"] for r in rows] == ["1", "2", "3"]
    assert rows[0]["lr"] == "" and rows[1]["lr"] == "0.0001"
    assert rows[2]["loss"] == "0.125"


def test_scalar_logger_csv_survives_resume(tmp_path):
    """A fresh ScalarLogger over an existing metrics.csv (training resume)
    must append, not truncate, the prior history — including when the
    resumed run introduces a new metric key."""
    import csv
    lg = ScalarLogger(str(tmp_path), tensorboard=False, csv=True)
    lg.log(1, {"loss": 0.5})
    lg.close()
    lg2 = ScalarLogger(str(tmp_path), tensorboard=False, csv=True)
    lg2.log(2, {"loss": 0.25, "lr": 1e-4})
    lg2.close()
    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["step"] for r in rows] == ["1", "2"]
    assert rows[0]["loss"] == "0.5" and rows[1]["lr"] == "0.0001"


def test_scalar_logger_wandb_gated(tmp_path):
    """wandb=True must degrade silently when the package is absent (the
    sandbox has no wandb; env-gated per SURVEY section 5)."""
    lg = ScalarLogger(str(tmp_path), tensorboard=False, wandb=True)
    lg.log(1, {"loss": 0.5})
    lg.close()
    assert json.loads(open(tmp_path / "train_log.jsonl").read())["loss"] == 0.5


def test_emergency_checkpoint_on_exception():
    saved = []
    with pytest.raises(RuntimeError):
        with emergency_checkpoint(lambda: saved.append(1), signum=None):
            raise RuntimeError("boom")
    assert saved == [1]


def test_emergency_checkpoint_on_sigusr1():
    """The handler only FLAGS; the save runs at the caller's next poll —
    a handler-time save could device_get a just-donated train state or
    reenter an in-progress orbax save (see emergency_checkpoint doc)."""
    saved = []
    with emergency_checkpoint(lambda: saved.append(1)) as poll:
        os.kill(os.getpid(), signal.SIGUSR1)
        assert saved == []          # nothing happens inside the handler
        assert poll() is True       # the step boundary runs the save
        assert poll() is False      # one signal -> one save
    assert saved == [1]


def test_emergency_checkpoint_no_save_on_success():
    saved = []
    with emergency_checkpoint(lambda: saved.append(1), signum=None) as poll:
        assert poll() is False
    assert saved == []


def test_image_logger_log_scale_early_steps(tmp_path):
    """Reference increase_log_steps semantics (vae/main.py:329-331): dense
    powers of two UP TO `every`, not multiples of `every` (which would be
    absorbed by the modulo and never add early dumps)."""
    from rangeldm_tpu.training.image_logger import ImageLogger

    lg = ImageLogger(str(tmp_path), every=1000)
    early = [s for s in range(1, 1000) if lg.should_log(s)]
    assert early == [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]
    assert lg.should_log(1000) and lg.should_log(2000)
    assert not lg.should_log(1500)


def test_image_logger_per_process_suffix(tmp_path):
    """Multi-host dumps pass a per-process suffix so N processes sharing an
    output_dir never race on the same PNG path (each writes its OWN local
    batch slice — a 'winning' unsuffixed file would be nondeterministic)."""
    import numpy as np
    from rangeldm_tpu.training.image_logger import ImageLogger

    lg = ImageLogger(str(tmp_path), every=10, suffix="_p1")
    lg.log(10, inputs=np.zeros((1, 4, 8, 2), np.float32))
    assert (tmp_path / "inputs_step00000010_p1.png").exists()
