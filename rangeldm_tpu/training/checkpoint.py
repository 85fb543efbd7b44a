"""Checkpoint / resume via Orbax (SURVEY.md section 5 checkpoint/resume).

Mirrors the reference's artifact layout semantics:
  * rolling `checkpoint-{step}` training states with a total limit
    (accelerator.save_state, ldm/train_unconditional.py:560-585)
  * a final pipeline directory with unet / unet_ema / vae params + configs
    (pipeline.save_pretrained, :654-682) — ours stores orbax trees plus a
    JSON config; convert/export.py can emit diffusers-compatible
    safetensors for interchange.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class TrainCheckpointer:
    def __init__(self, directory: str, total_limit: int = 10):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=total_limit, create=True,
                step_prefix="checkpoint"),
        )

    def save(self, step: int, state: Any) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template))


def save_pipeline(directory: str, *, unet_params, unet_cfg,
                  vae_params=None, vae_cfg=None, ema_params=None,
                  schedule_cfg=None, extra: Optional[Dict] = None) -> None:
    """Final artifact directory: {unet, unet_ema, vae}/ orbax trees +
    config.json per component (the save_pretrained equivalent).

    The artifact is built in a sibling tmp dir and swapped in whole: the
    previous pipeline survives any crash/preemption until the replacement
    is fully committed (destroy-then-write would leave config.json with
    no params as the ONLY copy of a finished run), and a re-save never
    mixes generations (a fresh dir cannot keep a stale unet_ema/ from an
    earlier save that this one omits).

    Multi-host: the orbax component saves are COLLECTIVE under
    jax.distributed (StandardCheckpointer.save runs a global sync
    internally), so every process must call into the SAME deterministic
    tmp tree — a per-process tmp name would deadlock/mismatch the
    collective. The filesystem mutations around them (stale-tmp cleanup,
    json writes, the whole-directory swap) are process-0-only, fenced by
    barriers so no process returns before the artifact exists."""
    import dataclasses
    import shutil

    primary = jax.process_index() == 0

    def barrier(tag: str) -> None:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(
                f"save_pipeline:{tag}:{directory}")

    # deterministic tmp: the collective orbax saves need one shared tree
    tmp = os.path.abspath(directory) + ".tmp"
    if primary:
        os.makedirs(os.path.dirname(os.path.abspath(directory)) or ".",
                    exist_ok=True)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
    barrier("tmp-ready")
    ckpt = ocp.StandardCheckpointer()

    def dump(name, params, cfg):
        if primary:
            os.makedirs(os.path.join(tmp, name), exist_ok=True)
        ckpt.save(os.path.join(tmp, name, "params"),
                  jax.tree.map(np.asarray, params))
        if cfg is not None and primary:
            with open(os.path.join(tmp, name, "config.json"), "w") as f:
                json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)

    dump("unet", unet_params, unet_cfg)
    if ema_params is not None:
        dump("unet_ema", ema_params, unet_cfg)
    if vae_params is not None:
        dump("vae", vae_params, vae_cfg)
    if primary:
        meta = {"schedule":
                dataclasses.asdict(schedule_cfg) if schedule_cfg else None}
        meta.update(extra or {})
        with open(os.path.join(tmp, "model_index.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
    ckpt.wait_until_finished()

    if primary:
        old = None
        if os.path.exists(directory):
            old = os.path.abspath(directory) + f".old-{os.getpid()}"
            os.rename(directory, old)
        os.rename(tmp, directory)
        if old is not None:
            shutil.rmtree(old, ignore_errors=True)
    barrier("committed")


def load_pipeline_component(directory: str, name: str, template) -> Any:
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(os.path.join(directory, name, "params")),
                        template)
