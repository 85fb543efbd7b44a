"""Scalar logging + emergency checkpointing.

ScalarLogger is the `accelerator.log` / Lightning-logger equivalent
(ldm/train_unconditional.py:587-591, vae/main.py:668-709): every scalar dict
goes to a jsonl stream (always) and to TensorBoard event files
(tensorboardX, when importable). The reference's optional wandb / CSV
logger choices (vae/main.py:668-709) map to the `wandb=` and `csv=` sinks:
CSV writes a Lightning-CSVLogger-style metrics.csv (header = union of keys,
rewritten when new keys appear), wandb is env-gated (skipped silently when
the package is absent; honors WANDB_MODE, defaulting to offline so no
sandbox egress is attempted).

emergency_checkpoint re-implements the reference's "melk" machinery
(vae/main.py:254-261, 876-895): a SIGUSR1 handler (cluster preemption
signal) and an on-exception hook that both run the provided save function
before the process dies.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import signal
import threading
from typing import Callable, Dict, Optional


class ScalarLogger:
    def __init__(self, out_dir: str, jsonl: str = "train_log.jsonl",
                 tensorboard: bool = True, csv: bool = False,
                 wandb: bool = False, wandb_project: str = "rangeldm_tpu",
                 primary: Optional[bool] = None):
        # multi-host: exactly one process writes the scalar sinks —
        # output_dir is normally shared storage, and N appenders to one
        # jsonl/csv (the csv path truncates-and-rewrites on new keys) or
        # two tensorboardX writers on one dir corrupt the logs. `primary`
        # defaults to process 0 (the accelerator.is_main_process gate of
        # ldm/train_unconditional.py's logging).
        if primary is None:
            import jax
            primary = jax.process_index() == 0
        self.primary = bool(primary)
        if not self.primary:
            self.tb = self.wandb = self.csv_path = self.jsonl_path = None
            return
        os.makedirs(out_dir, exist_ok=True)
        self.jsonl_path = os.path.join(out_dir, jsonl)
        self.tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self.tb = None
        self.csv_path = os.path.join(out_dir, "metrics.csv") if csv else None
        self._csv_keys: list = []
        self._csv_rows: list = []
        if self.csv_path and os.path.exists(self.csv_path):
            # resume: reload the previous run's rows so the first post-
            # resume log() appends instead of truncating the history
            import csv as csv_mod
            try:
                with open(self.csv_path, newline="") as f:
                    reader = csv_mod.DictReader(f)
                    self._csv_keys = list(reader.fieldnames or [])
                    self._csv_rows = list(reader)
            except Exception:
                self._csv_keys, self._csv_rows = [], []
        self.wandb = None
        if wandb:
            try:
                import wandb as wandb_mod
                self.wandb = wandb_mod.init(
                    project=wandb_project, dir=out_dir,
                    mode=os.environ.get("WANDB_MODE", "offline"))
            except Exception as e:
                # the caller asked for wandb explicitly — don't lose the
                # sink silently (ADVICE r3)
                logging.getLogger(__name__).warning(
                    "wandb requested but unavailable, continuing without "
                    "it: %s", e)
                self.wandb = None

    def _write_csv(self, rec: Dict[str, float]) -> None:
        import csv as csv_mod
        self._csv_rows.append(rec)
        new_keys = [k for k in rec if k not in self._csv_keys]
        if new_keys:
            # header grows -> rewrite the whole file (rows are sparse and
            # few: one per log_every steps), exactly Lightning CSVLogger's
            # behavior on new metric keys
            self._csv_keys.extend(new_keys)
            with open(self.csv_path, "w", newline="") as f:
                w = csv_mod.DictWriter(f, fieldnames=self._csv_keys)
                w.writeheader()
                w.writerows(self._csv_rows)
        else:
            with open(self.csv_path, "a", newline="") as f:
                csv_mod.DictWriter(f, fieldnames=self._csv_keys).writerow(rec)

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        if not self.primary:
            return
        rec = {k: float(v) for k, v in scalars.items()}
        rec["step"] = int(step)
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self.tb.add_scalar(k, v, int(step))
        if self.csv_path is not None:
            self._write_csv(rec)
        if self.wandb is not None:
            self.wandb.log({k: v for k, v in rec.items() if k != "step"},
                           step=int(step))

    def close(self) -> None:
        if self.tb is not None:
            self.tb.flush()
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()


@contextlib.contextmanager
def emergency_checkpoint(save_fn: Callable[[], None],
                         signum: Optional[int] = signal.SIGUSR1):
    """Deferred "melk" (vae/main.py:254-261): SIGUSR1 only SETS a flag; the
    yielded poll callable runs `save_fn` at the caller's next step
    boundary. Running the save inside the handler itself would be unsafe
    with donated train states — between dispatching
    `train_step(state, ...)` (donate_argnums=0) and rebinding the name,
    `state` points at deleted device buffers, so a handler-time
    device_get raises, escapes the handler at an arbitrary bytecode, and
    kills the run WITHOUT a checkpoint; it could also reenter a
    non-reentrant in-progress orbax save. Preemption grace windows
    (30-120 s) dwarf a step (~ms), so boundary-deferral loses nothing —
    but callers must ALSO poll right after long non-step work (sample
    dumps, validation passes), where a signal would otherwise wait out
    the whole operation plus one more step.

    Any exception escaping the block still triggers a best-effort save.
    Signal handlers can only be installed from the main thread; elsewhere
    (e.g. pytest workers) the signal half is skipped silently and only
    the on-exception save remains.
    """
    requested = threading.Event()

    def poll() -> bool:
        """Call once per training step; saves if a signal arrived."""
        if requested.is_set():
            requested.clear()
            save_fn()
            return True
        return False

    installed = False
    old = None
    if signum is not None and threading.current_thread() is threading.main_thread():
        def handler(_sig, _frame):
            requested.set()
        try:
            old = signal.signal(signum, handler)
            installed = True
        except (ValueError, OSError):
            installed = False
    try:
        yield poll
    except BaseException:
        try:
            save_fn()
        except Exception:
            pass
        raise
    finally:
        if installed:
            signal.signal(signum, old)
