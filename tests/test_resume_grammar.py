"""resume_from_checkpoint honors its VALUE (accelerate's grammar,
ldm/train_unconditional.py:560-585): true/'latest' -> newest of this run
(fresh start when none exists yet — preemptible jobs set the flag before
their first checkpoint); int/digit-string -> that step; a path -> that
checkpoints root or one checkpoint_N dir; an explicitly named missing
checkpoint is an ERROR, never a silent step-0 restart."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from rangeldm_tpu.train_ldm import LdmTrainer
from rangeldm_tpu.utils.config import Cfg

MODEL = {
    "model_config": {
        "sample_size": [16, 16],     # azimuth-first reference grammar
        "in_channels": 3, "out_channels": 2,
        "block_out_channels": [32, 32],
        "down_block_types": ["DownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "UpBlock2D"],
    },
    "train_batch_size": 8,
}


def _trainer(tmp_path, out, resume):
    cfg = dict(MODEL, output_dir=str(tmp_path / out),
               resume_from_checkpoint=resume)
    return LdmTrainer(Cfg.wrap(cfg))


def test_resume_value_grammar(tmp_path):
    t = _trainer(tmp_path, "run", "latest")
    # 'latest' with no checkpoints yet: fresh start, not an error
    assert t.resume() == 0
    t.state = t.state.replace(step=jnp.asarray(3, jnp.int32))
    t.ckpt.save(3, jax.device_get(t.state))

    assert _trainer(tmp_path, "run", True).resume() == 3
    assert _trainer(tmp_path, "run", "latest").resume() == 3
    # explicit step of this run
    assert _trainer(tmp_path, "run", 3).resume() == 3
    assert _trainer(tmp_path, "run", "3").resume() == 3

    # a path: another run resumes from the first run's checkpoints root,
    # or from one concrete checkpoint_N dir
    ckpt_root = str(tmp_path / "run" / "checkpoints")
    assert _trainer(tmp_path, "run2", ckpt_root).resume() == 3
    (step_dir,) = glob.glob(os.path.join(ckpt_root, "*3*"))
    assert _trainer(tmp_path, "run3", step_dir).resume() == 3

    # explicitly named but missing -> error, never a silent fresh start
    with pytest.raises(FileNotFoundError, match="resume_from_checkpoint"):
        _trainer(tmp_path, "run4", str(tmp_path / "nope")).resume()


def test_resume_int_not_bool_aliased(tmp_path):
    """int 1 == True and int 0 is falsy in Python; the grammar must still
    treat them as EXPLICIT step numbers (regression: `want in (True,
    "latest")` sent resume_from_checkpoint: 1 to the newest checkpoint)."""
    t = _trainer(tmp_path, "run", None)
    t.state = t.state.replace(step=jnp.asarray(1, jnp.int32))
    t.ckpt.save(1, jax.device_get(t.state))
    t.state = t.state.replace(step=jnp.asarray(5, jnp.int32))
    t.ckpt.save(5, jax.device_get(t.state))

    # 1 restores step 1 — NOT the newest, which True/'latest' resolve to
    assert _trainer(tmp_path, "run", 1).resume() == 1
    assert _trainer(tmp_path, "run", True).resume() == 5
    # 0 is an explicit missing step -> error, never a silent fresh start
    with pytest.raises(Exception):
        _trainer(tmp_path, "run", 0).resume()
