"""Scalar logging + emergency checkpointing.

ScalarLogger is the `accelerator.log` / Lightning-logger equivalent
(ldm/train_unconditional.py:587-591, vae/main.py:668-709): every scalar dict
goes to a jsonl stream (always) and to TensorBoard event files
(tensorboardX, when importable).

emergency_checkpoint re-implements the reference's "melk" machinery
(vae/main.py:254-261, 876-895): a SIGUSR1 handler (cluster preemption
signal) and an on-exception hook that both run the provided save function
before the process dies.
"""

from __future__ import annotations

import contextlib
import json
import os
import signal
import threading
from typing import Callable, Dict, Optional


class ScalarLogger:
    def __init__(self, out_dir: str, jsonl: str = "train_log.jsonl",
                 tensorboard: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self.jsonl_path = os.path.join(out_dir, jsonl)
        self.tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self.tb = None

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {k: float(v) for k, v in scalars.items()}
        rec["step"] = int(step)
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self.tb.add_scalar(k, v, int(step))

    def close(self) -> None:
        if self.tb is not None:
            self.tb.flush()
            self.tb.close()


@contextlib.contextmanager
def emergency_checkpoint(save_fn: Callable[[], None],
                         signum: Optional[int] = signal.SIGUSR1):
    """Run `save_fn` on SIGUSR1 and on any exception escaping the block.

    Signal handlers can only be installed from the main thread; elsewhere
    (e.g. pytest workers) the signal half is skipped silently and only the
    on-exception save remains.
    """
    installed = False
    old = None
    if signum is not None and threading.current_thread() is threading.main_thread():
        def handler(_sig, _frame):
            save_fn()
        try:
            old = signal.signal(signum, handler)
            installed = True
        except (ValueError, OSError):
            installed = False
    try:
        yield
    except BaseException:
        try:
            save_fn()
        except Exception:
            pass
        raise
    finally:
        if installed:
            signal.signal(signum, old)
