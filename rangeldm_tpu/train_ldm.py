"""LDM training CLI (T1/T2 equivalents).

    python -m rangeldm_tpu.train_ldm --cfg rangeldm_tpu/configs/rangeldm_kitti360.yaml

Covers ldm/train_unconditional.py:123-689 and train_conditional.py:119-662:
config-driven model build, frozen-VAE loading (sgm .ckpt via the converter,
or an orbax pipeline dir), data-parallel mesh training with EMA + cosine LR,
rolling checkpoints with resume, per-epoch sample dumps, and a final
pipeline directory artifact.
"""

from __future__ import annotations

import argparse
import os
import re
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rangeldm_tpu.models.unet import UNet2D
from rangeldm_tpu.models.vae import AutoencoderKL
from rangeldm_tpu.models.zoo import get_model_spec
from rangeldm_tpu.diffusion.schedule import Schedule, ScheduleConfig
from rangeldm_tpu.parallel.mesh import (
    data_sharding, make_mesh, replicated, shard_batch,
)
from rangeldm_tpu.training import conditions
from rangeldm_tpu.training.checkpoint import TrainCheckpointer, save_pipeline
from rangeldm_tpu.training.ldm_trainer import LdmTrainConfig, make_ldm_train_step
from rangeldm_tpu.training.train_state import TrainState, make_adamw
from rangeldm_tpu.utils.cache import enable_compilation_cache, init_on_cpu
from rangeldm_tpu.utils.config import Cfg, load_config


def expand_env(obj):
    if isinstance(obj, dict):
        return {k: expand_env(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [expand_env(v) for v in obj]
    if isinstance(obj, str):
        return re.sub(r"\$\{(\w+)\}", lambda m: os.environ.get(m.group(1), ""),
                      obj)
    return obj


def load_vae_params(vae: AutoencoderKL, path: Optional[str], image_shape):
    """Every artifact the VAE stage can hand to the LDM stage
    (vae/main.py:898-906 -> ldm/convert_vae.py -> train_unconditional's
    --vae): sgm torch `.ckpt` / our exported `.safetensors` via the
    converter; a pipeline dir (`<dir>/vae/params`) or VaeTrainer's
    `vae_final` dir (`<dir>/params`) via orbax; None -> random
    (smoke/testing)."""
    if path and (path.endswith(".ckpt") or path.endswith(".safetensors")):
        from rangeldm_tpu.convert.sgm_vae import load_sgm_vae
        return jax.tree.map(jnp.asarray, load_sgm_vae(path))
    template = init_on_cpu(vae.init, {"params": jax.random.PRNGKey(0)},
                           np.zeros((1,) + tuple(image_shape), np.float32),
                           rng=jax.random.PRNGKey(1))
    if path:
        from rangeldm_tpu.training.checkpoint import load_pipeline_component
        if os.path.isdir(os.path.join(path, "params")):
            # train_vae's save_final artifact: <out>/vae_final/{params}
            import orbax.checkpoint as ocp
            ckpt = ocp.StandardCheckpointer()
            return {"params": ckpt.restore(
                os.path.abspath(os.path.join(path, "params")),
                template["params"])}
        return {"params": load_pipeline_component(path, "vae", template["params"])}
    return template


def spec_from_cfg(cfg: Cfg):
    """Resolve the model spec: a zoo name (`model:`), or — the reference's
    own grammar (ldm/train_unconditional.py:237-242) — an inline
    `model_config:` dict whose sample_size is [azimuth, beams], plus an
    optional `vae_config:` dict for the latent autoencoder."""
    if cfg.get("model_config"):
        from rangeldm_tpu.models.unet import UNetConfig
        from rangeldm_tpu.models.vae import VaeConfig
        from rangeldm_tpu.models.zoo import ModelSpec
        vae = None
        if cfg.get("vae_config"):
            vae = VaeConfig(**{k: tuple(v) if isinstance(v, list) else v
                               for k, v in dict(cfg.vae_config).items()})
        unet = UNetConfig.from_reference(dict(cfg.model_config))
        h, w = unet.sample_size
        factor = vae.down_factor if vae is not None else 1
        default_size = (h * factor, w * factor)
        pos = bool(cfg.get("pos_encoding", True))
        # conditional runs (upsample/inpainting) reserve the input channels
        # beyond out(+pos) for the condition — without this the in-training
        # sample dump would take the unconditional path and feed conv_in
        # too few channels (round-3 review)
        cond = 0
        if cfg.get("upsample") or cfg.get("inpainting"):
            cond = unet.in_channels - unet.out_channels - (1 if pos else 0)
        return ModelSpec(
            name=cfg.get("model", "custom"), unet=unet, vae=vae,
            image_size=tuple(cfg.get("image_size", default_size)),
            pos_encoding=pos, cond_channels=cond)
    return get_model_spec(cfg.model)


class LdmTrainer:
    """Orchestration object; `fit` consumes any iterator of batch dicts."""

    def __init__(self, cfg: Cfg, mesh=None):
        enable_compilation_cache()
        self.cfg = cfg
        self.spec = spec_from_cfg(cfg)
        self.mesh = mesh or make_mesh()
        self.dtype = jnp.bfloat16 if cfg.get("mixed_precision") == "bf16" \
            else jnp.float32

        self.unet = UNet2D(self.spec.unet, dtype=self.dtype)
        self.schedule = Schedule.create(ScheduleConfig(
            num_train_timesteps=int(cfg.get("ddpm_num_steps", 1000)),
            beta_schedule=cfg.get("ddpm_beta_schedule", "linear"),
            prediction_type=cfg.get("prediction_type", "epsilon")))

        with_vae = bool(cfg.get("with_vae", self.spec.vae is not None))
        self.vae = AutoencoderKL(self.spec.vae, dtype=self.dtype) \
            if with_vae else None
        self.vae_params = None
        if self.vae is not None:
            img_shape = (*self.spec.image_size, self.spec.vae.in_channels)
            self.vae_params = load_vae_params(
                self.vae, cfg.get("vae_checkpoint"), img_shape)
            # put on device BEFORE the train-step/cond_fn closures capture
            # them — a host copy captured by jit would be re-staged as a
            # separate constant while the replicated copy serves only the
            # sampler
            self.vae_params = jax.device_put(self.vae_params,
                                             replicated(self.mesh))

        total_steps = int(cfg.get("total_steps", 1_000_000))
        self.tx = make_adamw(
            learning_rate=float(cfg.get("learning_rate", 1e-4)),
            warmup_steps=int(cfg.get("lr_warmup_steps", 500)),
            total_steps=total_steps,
            schedule=cfg.get("lr_scheduler", "cosine"),
            beta1=float(cfg.get("adam_beta1", 0.95)),
            beta2=float(cfg.get("adam_beta2", 0.999)),
            weight_decay=float(cfg.get("adam_weight_decay", 1e-6)),
            eps=float(cfg.get("adam_epsilon", 1e-8)))

        self.train_cfg = LdmTrainConfig(
            pos_encoding=self.spec.pos_encoding and bool(
                cfg.get("pos_encoding", True)),
            scaling_factor=self.spec.vae.scaling_factor if self.spec.vae else 1.0,
            pixel_scaling=cfg.get("scaling_factor"),
            shifting_factor=float(cfg.get("shifting_factor", 0.0)),
            snr_gamma=cfg.get("snr_gamma"),
            ema_inv_gamma=float(cfg.get("ema_inv_gamma", 1.0)),
            ema_power=float(cfg.get("ema_power", 0.75)),
            ema_max_decay=float(cfg.get("ema_max_decay", 0.9999)),
            grad_accum_steps=int(cfg.get("gradient_accumulation_steps", 1)))

        cond_fn = None
        if cfg.get("upsample"):
            # the azimuth pixel-unshuffle factor is the VAE's spatial down
            # factor (the reference's SparseRangeImageEncoder2 hardcodes 4
            # = its VAE's, ldm/encoders.py:90-95), NOT the beam-
            # densification factor; they must agree or the condition's
            # beam extent cannot match the latent's
            factor = self.spec.vae.down_factor if self.spec.vae else \
                int(cfg.upsample)
            if int(cfg.upsample) != factor:
                raise ValueError(
                    f"upsample factor {cfg.upsample} != VAE down factor "
                    f"{factor}: the unshuffled condition "
                    f"(beams/{cfg.upsample}, azimuth/{factor}) cannot "
                    "match the latent grid (the reference supports "
                    "densification == 4 == its VAE factor only)")
            cond_fn = conditions.make_upsample_cond_fn(factor)
        elif cfg.get("inpainting"):
            cond_fn = conditions.make_inpainting_cond_fn(
                self.vae, self.vae_params, self.train_cfg.scaling_factor,
                self.spec.unet.sample_size)
        self.cond_fn = cond_fn
        self._cond_sample_fns = {}   # batch_size -> jitted sampler

        vae_apply = None
        if self.vae is not None:
            vae_apply = lambda p, x: self.vae.apply(  # noqa: E731
                p, x, method="encode_moments")

        step_fn = make_ldm_train_step(
            unet_apply=lambda p, x, t: self.unet.apply({"params": p}, x, t),
            schedule=self.schedule, tx=self.tx, cfg=self.train_cfg,
            vae_apply=vae_apply, vae_params=self.vae_params, cond_fn=cond_fn)

        repl = replicated(self.mesh)
        data = data_sharding(self.mesh)
        self._shard_repl, self._shard_data = repl, data
        self.train_step = jax.jit(step_fn, donate_argnums=(0,))

        # state init
        h, w = self.spec.unet.sample_size
        x0 = np.zeros((1, h, w, self.spec.unet.in_channels), np.float32)
        params = init_on_cpu(self.unet.init, jax.random.PRNGKey(0), x0,
                             np.zeros((1,), np.int32))["params"]
        state = TrainState.create(params, self.tx,
                                  with_ema=bool(cfg.get("use_ema", True)))
        self.state = jax.device_put(state, repl)

        out_dir = cfg.get("output_dir") or "runs/default"
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.ckpt = TrainCheckpointer(
            os.path.join(out_dir, "checkpoints"),
            total_limit=int(cfg.get("checkpoints_total_limit", 10)))

    # ------------------------------------------------------------------
    def resume(self) -> int:
        """Honor resume_from_checkpoint's VALUE (accelerate's grammar,
        ldm/train_unconditional.py:560-585): true/'latest' -> this run's
        newest checkpoint (fresh start when none — a preemptible job sets
        the flag before its first checkpoint exists); an int or digit
        string -> that step of this run; a path -> that checkpoints root
        or a single 'checkpoint_N' dir. An explicitly named checkpoint
        that is missing is an ERROR, never a silent step-0 restart."""
        want = self.cfg.get("resume_from_checkpoint")
        if want is None or want is False or want == "":
            return 0
        ckpt, step, explicit = self.ckpt, None, False
        # identity/str checks, NOT `want in (True, "latest")`: int 1 == True
        # in Python, so a YAML `resume_from_checkpoint: 1` would silently
        # restore the NEWEST checkpoint instead of step 1
        if not (want is True or want == "latest"):
            explicit = True
            s = str(want)
            if s.isdigit():
                step = int(s)
            else:
                import re
                path = os.path.abspath(s.rstrip("/"))
                m = re.search(r"checkpoint[-_](\d+)$", os.path.basename(path))
                if m:
                    step = int(m.group(1))
                    path = os.path.dirname(path)
                ckpt = TrainCheckpointer(path)
        if step is not None and ckpt.latest_step() is None:
            raise FileNotFoundError(
                f"resume_from_checkpoint={want!r}: no checkpoints found")
        restored = ckpt.restore(jax.device_get(self.state), step=step)
        if restored is None:
            if explicit:
                raise FileNotFoundError(
                    f"resume_from_checkpoint={want!r}: checkpoint not found")
            return 0
        self.state = jax.device_put(restored, self._shard_repl)
        return int(self.state.step)

    def _dump_sharding(self, batch_size: int):
        """Batch sharding for in-training sample dumps: reuse the training
        mesh when it divides the dump batch (so the dump runs on all chips
        like the train step), else fall back to single-device. Multi-host
        dumps are per-process (each host writes its own grid), so they
        must NOT compile a global-mesh program — its output would span
        non-addressable devices and the host fetch would raise."""
        if jax.process_count() > 1:
            return None
        if self.mesh.size > 1 and batch_size % self.mesh.size == 0:
            return self._shard_data
        return None

    @staticmethod
    def _dump_params(params):
        """Params for a per-process dump program: on multi-host runs the
        train params are committed to the GLOBAL mesh — pull a host copy
        (legal for fully-replicated arrays) so the single-device dump jit
        never mixes global-committed and local arrays."""
        if jax.process_count() > 1:
            return jax.device_get(params)
        return params

    def make_sample_fn(self, batch_size: int = 8, num_steps: int = 50):
        """Jitted sampler over the CURRENT ema (or live) params — the
        per-epoch sample dump of ldm/train_unconditional.py:597-652.
        Returned fn(params, rng) -> decoded images (pixel space if no VAE).
        Mesh-sharded over the training mesh when the batch divides it."""
        from rangeldm_tpu.pipelines.samplers import ddim_sample, latent_sample
        h, w = self.spec.unet.sample_size
        pos = self.train_cfg.pos_encoding
        shd = self._dump_sharding(batch_size)

        def sample(params, rng):
            def unet_fn(x, t):
                return self.unet.apply({"params": params}, x, t)
            if self.vae is not None:
                def vae_decode(z):
                    return self.vae.apply(self.vae_params, z, method="decode")
                return latent_sample(
                    unet_fn, vae_decode, self.schedule, rng,
                    (batch_size, h, w, self.spec.unet.out_channels),
                    self.train_cfg.scaling_factor, num_steps=num_steps,
                    pos_encoding=pos, dtype=self.dtype, sharding=shd)
            return ddim_sample(unet_fn, self.schedule, rng,
                               (batch_size, h, w, self.spec.unet.out_channels),
                               num_steps=num_steps, pos_encoding=pos,
                               dtype=self.dtype, sharding=shd)

        if shd is None:
            return jax.jit(sample)
        return jax.jit(sample, out_shardings=shd)

    def make_cond_sample_fn(self, batch_size: int, num_steps: int = 50):
        """Jitted conditional sampler (the in-training sample dump of
        ldm/train_conditional.py:542-570, which drives
        LDMUpscalePipelineRange with the last train batch's conditions)."""
        from rangeldm_tpu.pipelines.samplers import conditional_latent_sample
        h, w = self.spec.unet.sample_size
        shd = self._dump_sharding(batch_size)

        def sample(params, rng, cond_inputs):
            rng, sub = jax.random.split(rng)
            cond = self.cond_fn(cond_inputs, sub)

            def unet_fn(x, t):
                return self.unet.apply({"params": params}, x, t)

            return conditional_latent_sample(
                unet_fn,
                lambda z: self.vae.apply(self.vae_params, z, method="decode"),
                self.schedule, rng,
                (batch_size, h, w, self.spec.unet.out_channels),
                self.train_cfg.scaling_factor, cond, num_steps=num_steps,
                pos_encoding=self.train_cfg.pos_encoding, dtype=self.dtype,
                sharding=shd)

        if shd is None:
            return jax.jit(sample)
        return jax.jit(sample, out_shardings=shd)

    def _dump_norm(self):
        """(mean, std) used to denormalize dumped grids — one resolution
        shared by the conditional and unconditional dump paths."""
        dcfg = self.cfg.get("data", {})
        from rangeldm_tpu.geometry import get_spec
        sp = get_spec(dcfg.get("sensor", self.spec.sensor),
                      log=bool(dcfg.get("log", False)),
                      inverse=bool(dcfg.get("inverse", False)))
        return float(dcfg.get("mean", sp.mean)), float(dcfg.get("std", sp.std))

    @staticmethod
    def _to_local_np(x) -> np.ndarray:
        from rangeldm_tpu.parallel.mesh import to_local_np
        return to_local_np(x)

    def _dump_conditional(self, step: int, cond_batch) -> str:
        """Write result/target/input grids from the held train batch's
        conditions (reference triplet layout, train_conditional.py:542-570)."""
        from rangeldm_tpu.training.image_logger import save_range_image_grid
        keys = [k for k in ("down", "masked_image", "inpainting_mask")
                if k in cond_batch]
        local = {k: self._to_local_np(cond_batch[k]) for k in keys}
        n = min(int(local[keys[0]].shape[0]), 8)
        cond_inputs = {k: jnp.asarray(v[:n]) for k, v in local.items()}
        fn = self._cond_sample_fns.get(n)
        if fn is None:
            fn = self._cond_sample_fns[n] = self.make_cond_sample_fn(
                n, num_steps=int(self.cfg.get("ddpm_num_inference_steps", 50)))
        params = self.state.ema_params if self.state.ema_params is not None \
            else self.state.params
        result = np.asarray(fn(self._dump_params(params),
                               jax.random.PRNGKey(step), cond_inputs),
                            np.float32)
        mean, std = self._dump_norm()
        base = os.path.join(self.out_dir, "samples")
        grids = {"result": result}
        if "jpg" in cond_batch:
            grids["target"] = self._to_local_np(cond_batch["jpg"])[:n]
        grids["input"] = local[
            "down" if "down" in local else "masked_image"][:n]
        suffix = f"_p{jax.process_index()}" if jax.process_count() > 1 else ""
        for name, imgs in grids.items():
            save_range_image_grid(
                np.asarray(imgs, np.float32),
                os.path.join(base,
                             f"samples_step{step:08d}_{name}{suffix}.png"),
                mean=mean, std=std)
        return os.path.join(base, f"samples_step{step:08d}_result{suffix}.png")

    def dump_samples(self, step: int, sample_fn=None,
                     cond_batch=None) -> Optional[str]:
        from rangeldm_tpu.training.image_logger import save_range_image_grid
        if self.spec.cond_channels:
            if cond_batch is None or self.cond_fn is None:
                # no condition inputs available (e.g. called outside fit);
                # use sample_conditional.py offline
                import logging
                logging.getLogger(__name__).warning(
                    "sample_every_steps needs a condition batch for "
                    "conditional models (use rangeldm_tpu.sample_conditional "
                    "offline, or call dump_samples(cond_batch=...))")
                return None
            return self._dump_conditional(step, cond_batch)
        if sample_fn is None:
            sample_fn = self._sample_fn = getattr(
                self, "_sample_fn", None) or self.make_sample_fn(
                num_steps=int(self.cfg.get("ddpm_num_inference_steps", 50)))
        if jax.process_count() > 1 and jax.process_index() != 0:
            # unconditional dumps are seed-deterministic, so every process
            # would write the identical grid — one writer avoids racing
            # non-atomic writes of the same shared-fs file
            return None
        params = self.state.ema_params if self.state.ema_params is not None \
            else self.state.params
        imgs = np.asarray(sample_fn(self._dump_params(params),
                                    jax.random.PRNGKey(step)),
                          np.float32)
        path = os.path.join(self.out_dir, "samples",
                            f"samples_step{step:08d}.png")
        mean, std = self._dump_norm()
        save_range_image_grid(imgs, path, mean=mean, std=std)
        return path

    def fit(self, batches, max_steps: Optional[int] = None,
            log_every: int = 50, loader=None) -> dict:
        """`loader`: the RangeLoader feeding `batches` (which may wrap it
        in an epoch generator) — used only to surface its live
        producer-wait fraction as the `data_wait_frac` step metric."""
        from rangeldm_tpu.training.loggers import (
            ScalarLogger, emergency_checkpoint,
        )
        cfg = self.cfg
        rng = jax.device_put(jax.random.PRNGKey(int(cfg.get("seed", 0))),
                             self._shard_repl)
        ckpt_steps = int(cfg.get("checkpointing_steps", 500))
        sample_steps = cfg.get("sample_every_steps")
        logger = ScalarLogger(self.out_dir,
                              tensorboard=bool(cfg.get("tensorboard", True)),
                              csv=bool(cfg.get("csv_log", False)),
                              wandb=bool(cfg.get("wandb", False)))
        last = {}
        t0 = time.perf_counter()
        step0 = int(self.state.step)      # resume-aware throughput base

        def save_now():
            self.ckpt.save(int(self.state.step), jax.device_get(self.state))

        try:
            with emergency_checkpoint(save_now) as melk:
                step = step0
                for batch in batches:
                    batch = {k: v for k, v in batch.items()
                             if k in ("jpg", "moments", "down",
                                      "masked_image", "inpainting_mask")}
                    batch = shard_batch(self.mesh, batch)
                    self.state, metrics = self.train_step(self.state, batch, rng)
                    melk()   # deferred SIGUSR1 save, at a state-consistent point
                    # host-side step counter: int(self.state.step) every
                    # iteration would block on the just-dispatched step and
                    # serialize dispatch with device compute over the
                    # tunnel; sync only at log/ckpt/sample boundaries
                    step += 1
                    if step % log_every == 0 or (max_steps and step >= max_steps):
                        last = {k: float(v) for k, v in metrics.items()}
                        last.update(
                            step=step,
                            sps=((step - step0)
                                 / max(time.perf_counter() - t0, 1e-9)))
                        if loader is not None:
                            # input-pipeline health: fraction of wall-clock
                            # the consumer spent blocked on an empty queue
                            # (LoaderStallWarning fires on sustained stalls)
                            last["data_wait_frac"] = round(
                                float(getattr(loader, "wait_fraction", 0.0)),
                                4)
                        logger.log(step, last)
                    if step % ckpt_steps == 0:
                        self.ckpt.save(step, jax.device_get(self.state))
                    if sample_steps and step % int(sample_steps) == 0:
                        # conditional models sample from the current train
                        # batch's conditions (the reference uses the last
                        # train batch, train_conditional.py:542-570)
                        self.dump_samples(
                            step,
                            cond_batch=batch if self.spec.cond_channels
                            else None)
                        melk()   # a dump takes seconds-to-minutes; serve a
                        # signal that landed during it before the next step
                    if max_steps and step >= max_steps:
                        break
        finally:
            # flush the TensorBoard writer even on the crash path the
            # emergency checkpoint targets
            logger.close()
        return last

    def save_final(self) -> str:
        path = os.path.join(self.out_dir, "pipeline")
        state = jax.device_get(self.state)
        save_pipeline(
            path, unet_params=state.params, unet_cfg=self.spec.unet,
            ema_params=state.ema_params,
            vae_params=(jax.device_get(self.vae_params)["params"]
                        if self.vae_params is not None else None),
            vae_cfg=self.spec.vae, schedule_cfg=self.schedule.cfg,
            extra={"model": self.spec.name,
                   "pos_encoding": self.train_cfg.pos_encoding,
                   "image_size": list(self.spec.image_size),
                   # the sensor geometry the model was trained against —
                   # RangePipeline.from_pretrained uses it as the default
                   # back-projection spec (the reference keeps this in the
                   # user's head; a nuScenes checkpoint projected with
                   # kitti360 tables silently produces garbage clouds)
                   "sensor": self.cfg.get("data", {}).get(
                       "sensor", self.spec.sensor),
                   # ... and the range normalization/encoding it was
                   # trained with: a model trained with custom mean/std or
                   # log/inverse encoding back-projects systematically
                   # mis-scaled clouds under the sensor defaults
                   "normalization": self._norm_record()})
        return path

    def _norm_record(self) -> dict:
        dcfg = self.cfg.get("data", {})
        mean, std = self._dump_norm()
        return {"mean": mean, "std": std,
                "log": bool(dcfg.get("log", False)),
                "inverse": bool(dcfg.get("inverse", False))}


def main():
    from rangeldm_tpu.utils.cache import honor_jax_platforms_env
    honor_jax_platforms_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, nargs="+",
                    help="YAML config(s), merged left-to-right — later "
                         "files override (vae/main.py:632-636 convention)")
    ap.add_argument("--max_steps", type=int, default=None)
    args = ap.parse_args()
    cfg = Cfg.wrap(expand_env(load_config(*args.cfg)))

    from rangeldm_tpu.data.datasets import (
        DatasetConfig, RangeImageDataset, RangeLoader,
    )
    dcfg = cfg.get("data", {})
    ds = RangeImageDataset(DatasetConfig(
        root=dcfg.get("root", ""), sensor=dcfg.get("sensor", "kitti360"),
        width=int(dcfg.get("width", 1024)),
        used_feature=int(dcfg.get("used_feature", 2)),
        downsample=cfg.get("upsample"), inpainting=cfg.get("inpainting"),
        cache_compress=bool(dcfg.get("cache_compress", True)),
        mean=dcfg.get("mean"), std=dcfg.get("std"),
        # the LDM stage must train on the SAME range encoding its frozen
        # VAE was trained with (train_vae sets these from loss.encoding)
        log=bool(dcfg.get("log", False)),
        inverse=bool(dcfg.get("inverse", False))), train=True)
    bs = int(cfg.get("train_batch_size", 32))
    trainer = LdmTrainer(cfg)

    if (cfg.get("cache_latents") and trainer.vae is not None
            and not cfg.get("upsample") and not cfg.get("inpainting")):
        # unconditional frozen-VAE training: encode the dataset once and
        # train from cached posterior moments (saves the 36%-of-step
        # encoder forward every step; training/latent_cache.py)
        from rangeldm_tpu.training.latent_cache import (
            MomentsDataset, params_fingerprint, precompute_moments,
        )
        # the tag carries the encode COMPUTE dtype too: identical params
        # encoded under bf16 vs f32 give different moments, and toggling
        # mixed_precision must not silently reuse the other regime's cache
        moments = precompute_moments(
            trainer.vae, trainer.vae_params, ds, batch_size=bs,
            out_path=os.path.join(trainer.out_dir, "latent_moments.npy"),
            tag=(f"{params_fingerprint(trainer.vae_params)}"
                 f":{np.dtype(trainer.vae.dtype).name}"),
            log=print, mesh=trainer.mesh)
        loader = RangeLoader(MomentsDataset(moments), batch_size=bs,
                             shard_by_process=jax.process_count() > 1)
    else:
        if cfg.get("cache_latents"):
            print("[latent-cache] cache_latents ignored: it applies only "
                  "to unconditional training with a frozen VAE "
                  "(conditional runs need per-step images for conditions)")
        loader = RangeLoader(ds, batch_size=bs,
                             shard_by_process=jax.process_count() > 1)

    start = trainer.resume()
    if start:
        print(f"[resume] restored step {start}")
    steps_per_epoch = len(loader)
    total = int(cfg.get("num_epochs", 1000)) * steps_per_epoch

    def epochs():
        while True:
            yield from loader

    trainer.fit(epochs(), max_steps=args.max_steps or total, loader=loader)
    trainer.save_final()


if __name__ == "__main__":
    main()
