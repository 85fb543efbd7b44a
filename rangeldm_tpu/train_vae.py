"""VAE training CLI (T4 equivalent of vae/main.py).

    python -m rangeldm_tpu.train_vae --cfg rangeldm_tpu/configs/vae_kitti360.yaml

Per batch, one generator step then one discriminator step (the explicit form
of the engine's two-optimizer training_step, autoencoder.py:186-221; PL
version quirks noted in SURVEY.md section 3.3). LR scaling follows
vae/main.py:846-873: lr = accum * n_devices * batch_size * base_lr.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rangeldm_tpu.models.discriminator import (
    NLayerDiscriminator, NLayerDiscriminatorMetaKernel,
    NLayerDiscriminatorMetaKernel2,
)
from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig
from rangeldm_tpu.parallel.mesh import (
    data_sharding, make_mesh, replicated, shard_batch,
)
from rangeldm_tpu.training.checkpoint import TrainCheckpointer
from rangeldm_tpu.training.vae_trainer import (
    VaeLossConfig, create_vae_gan_state, make_disc_apply, make_vae_gan_steps,
)
from rangeldm_tpu.utils.cache import enable_compilation_cache, init_on_cpu
from rangeldm_tpu.utils.config import Cfg, load_config


class VaeTrainer:
    def __init__(self, cfg: Cfg, mesh=None):
        enable_compilation_cache()
        self.cfg = cfg
        self.mesh = mesh or make_mesh()
        # opt-in bf16 compute for the VAE/disc forwards (the reference
        # trains f32; all GAN loss arithmetic stays f32 — vae_trainer
        # upcasts at the module boundaries)
        self.dtype = jnp.bfloat16 \
            if cfg.get("mixed_precision") == "bf16" else None
        vcfg = cfg.get("vae", {})
        dcfg = cfg.get("data", {})
        lcfg = cfg.get("loss", {})
        uf = int(dcfg.get("used_feature", 2))
        self.vae_cfg = VaeConfig(
            in_channels=uf, out_ch=uf,
            ch=int(vcfg.get("ch", 64)),
            ch_mult=tuple(vcfg.get("ch_mult", (1, 2, 4))),
            z_channels=int(vcfg.get("z_channels", 4)),
            act=vcfg.get("act", "silu"),
            circular=bool(vcfg.get("circular", True)))
        self.vae = AutoencoderKL(self.vae_cfg, dtype=self.dtype)

        # ONE sensor spec drives the dataset normalization, the MetaKernel
        # discriminator geometry, and the BEV/perceptual branches — built
        # from the full data config (+ loss.encoding) so they cannot
        # diverge (the dataset builds its own identical copy from the same
        # keys, data/datasets.py:52-60)
        from rangeldm_tpu.geometry import get_spec
        encoding = lcfg.get("encoding", "linear")
        spec_kw = {"width": int(dcfg.get("width", 1024)),
                   "log": encoding == "log",
                   "inverse": encoding == "inverse"}
        if dcfg.get("mean") is not None:
            spec_kw["mean"] = float(dcfg.get("mean"))
        if dcfg.get("std") is not None:
            spec_kw["std"] = float(dcfg.get("std"))
        self.sensor_spec = get_spec(dcfg.get("sensor", "kitti360"),
                                    **spec_kw)
        self.loss_cfg = VaeLossConfig(
            disc_start=int(lcfg.get("disc_start", 200000)),
            disc_weight=float(lcfg.get("disc_weight", 0.5)),
            range_weight=float(lcfg.get("range_weight", 40.0)),
            intensity_weight=float(lcfg.get("intensity_weight", 10.0)),
            kl_weight=float(lcfg.get("kl_weight", 1e-6)),
            encoding=lcfg.get("encoding", "linear"),
            use_rec_loss_true=bool(lcfg.get("use_rec_loss_true", False)),
            use_rec_loss_true_power=bool(
                lcfg.get("use_rec_loss_true_power", False)),
            rec_power=float(lcfg.get("rec_power", 2.0)),
            bev_rec_weight=float(lcfg.get("bev_rec_weight", 0.0)),
            perceptual_weight=float(lcfg.get("perceptual_weight", 0.0)),
            bev_perceptual=bool(lcfg.get("bev_perceptual", False)),
            disc_bev=bool(lcfg.get("disc_bev", False)),
            used_feature=uf,
            disc_factor=float(lcfg.get("disc_factor", 1.0)),
            disc_loss=lcfg.get("disc_loss", "hinge"),
            learn_logvar=bool(lcfg.get("learn_logvar", False)),
            logvar_init=float(lcfg.get("logvar_init", 0.0)),
            ema_decay=float(lcfg.get("ema_decay", 0.9999)))
        mk = lcfg.get("metakernel", True)
        if self.loss_cfg.disc_bev and mk:
            # MetaKernel un-normalizes channel 0 as a range image and builds
            # per-pixel lidar geometry; feeding it BEV density grids would
            # train against meaningless geometry. The reference's disc_bev
            # path only makes sense with the plain PatchGAN.
            raise ValueError(
                "loss.disc_bev requires loss.metakernel: false "
                "(the MetaKernel discriminator interprets channel 0 as a "
                "normalized range image, not a BEV density grid)")
        # reference knob (losses/__init__.py:95 disc_num_layers): depth of
        # every discriminator variant; small images need fewer stride-2
        # stages or the logits collapse to zero extent
        nl = int(lcfg.get("disc_num_layers", 3))
        if mk == 2:
            self.disc = NLayerDiscriminatorMetaKernel2(
                n_layers=nl, range_mean=self.sensor_spec.mean,
                range_std=self.sensor_spec.std, dtype=self.dtype)
        elif mk:
            self.disc = NLayerDiscriminatorMetaKernel(
                n_layers=nl, range_mean=self.sensor_spec.mean,
                range_std=self.sensor_spec.std, dtype=self.dtype)
        else:
            self.disc = NLayerDiscriminator(
                ndf=int(lcfg.get("disc_ndf", 64)), n_layers=nl,
                dtype=self.dtype)

        bs = int(cfg.get("batch_size", 16))
        base_lr = float(cfg.get("base_learning_rate", 4.5e-6))
        # reference LR rule: accum * global_batch * base_lr
        # (vae/main.py:846-873). cfg batch_size IS the global batch here
        # (the loader yields bs and shard_batch splits it across devices),
        # so no extra device-count factor.
        lr = base_lr * bs if cfg.get("scale_lr", True) else base_lr
        self.gen_tx = optax.adam(lr)
        self.disc_tx = optax.adam(lr)

        h, w = cfg.get("image_size", (64, 1024))
        x0 = np.zeros((1, h, w, uf), np.float32)
        vae_params = init_on_cpu(self.vae.init,
                                 {"params": jax.random.PRNGKey(0)}, x0,
                                 rng=jax.random.PRNGKey(1))
        disc_vars = init_on_cpu(self.disc.init, jax.random.PRNGKey(2), x0)
        state = create_vae_gan_state(vae_params, disc_vars, self.gen_tx,
                                     self.disc_tx, self.loss_cfg)

        repl = replicated(self.mesh)
        self._repl = repl
        self.state = jax.device_put(state, repl)

        voxel_fn = None
        lc = self.loss_cfg
        sensor_spec = self.sensor_spec
        if lc.bev_rec_weight > 0 or lc.bev_perceptual or lc.disc_bev:
            import functools
            from rangeldm_tpu.geometry import to_voxel
            voxel_fn = functools.partial(to_voxel, spec=sensor_spec)
        perceptual_fn = None
        if lc.perceptual_weight > 0:
            from rangeldm_tpu.models.lpips import make_perceptual_fn
            # branch/net pairing mirrors the reference dispatch
            # (losses/__init__.py:257-292): darknet sees range images,
            # VGG-LPIPS only ever sees the 3-channel BEV construction, and
            # the non-BEV non-darknet case is pointcloud 3D-LPIPS (pcdet
            # CUDA, out of scope).
            kind = lcfg.get("perceptual_kind",
                            "vgg" if lc.bev_perceptual else "darknet")
            if kind == "vgg" and not lc.bev_perceptual:
                raise ValueError(
                    "perceptual_kind: vgg needs loss.bev_perceptual: true "
                    "(the reference's non-BEV perceptual is pointcloud "
                    "3D-LPIPS, which needs pcdet CUDA ops and is out of "
                    "scope; use perceptual_kind: darknet for range images)")
            if kind == "darknet" and lc.bev_perceptual:
                raise ValueError(
                    "perceptual_kind: darknet needs loss.bev_perceptual: "
                    "false (the reference's darknet branch takes precedence "
                    "over bev_perceptual and sees range images, "
                    "losses/__init__.py:258-266)")
            perceptual_fn = make_perceptual_fn(
                cfg.get("lpips_checkpoint"), kind=kind, spec=sensor_spec)

        gen_step, disc_step = make_vae_gan_steps(
            self.vae, make_disc_apply(self.disc), self.gen_tx, self.disc_tx,
            self.loss_cfg, voxel_fn=voxel_fn, perceptual_fn=perceptual_fn)
        self.gen_step = jax.jit(gen_step, donate_argnums=(0,))
        self.disc_step = jax.jit(disc_step, donate_argnums=(0,))

        out = cfg.get("output_dir") or "runs/vae"
        self.out_dir = out
        os.makedirs(out, exist_ok=True)
        self.ckpt = TrainCheckpointer(os.path.join(out, "checkpoints"),
                                      total_limit=3)

    def resume(self) -> int:
        restored = self.ckpt.restore(jax.device_get(self.state))
        if restored is not None:
            self.state = jax.device_put(restored, self._repl)
            return int(self.state.step)
        return 0

    def fit(self, batches, max_steps: Optional[int] = None,
            log_every: int = 50, loader=None) -> dict:
        rng = jax.random.PRNGKey(int(self.cfg.get("seed", 0)))
        ckpt_every = int(self.cfg.get("checkpoint_every_steps", 1020))
        image_logger = None
        if self.cfg.get("log_images_every"):
            from rangeldm_tpu.training.image_logger import ImageLogger
            # denormalize with the SAME sensor spec the dataset normalizes
            # with (covers nuScenes 50/50 and log/inverse encodings — the
            # raw data-cfg defaults would mis-scale non-KITTI grids)
            image_logger = ImageLogger(
                os.path.join(self.out_dir, "images"),
                every=int(self.cfg.log_images_every),
                mean=float(self.sensor_spec.mean),
                std=float(self.sensor_spec.std),
                # each process dumps its own local slice (to_local_np
                # below); a shared fs would race on one PNG path otherwise
                # — same convention as train_ldm's _p{proc} sample dumps
                suffix=(f"_p{jax.process_index()}"
                        if jax.process_count() > 1 else ""))
        from rangeldm_tpu.training.loggers import (
            ScalarLogger, emergency_checkpoint,
        )
        logger = ScalarLogger(
            self.out_dir,
            tensorboard=bool(self.cfg.get("tensorboard", True)),
            csv=bool(self.cfg.get("csv_log", False)),
            wandb=bool(self.cfg.get("wandb", False)))
        last = {}

        def save_now():
            self.ckpt.save(int(self.state.step), jax.device_get(self.state))

        @jax.jit
        def _recon(params, x, key):
            xrec, _, _ = self.vae.apply({"params": params}, x, rng=key)
            return xrec

        try:
            with emergency_checkpoint(save_now) as melk:
                step = int(self.state.step)
                for batch in batches:
                    x = batch["jpg"] if isinstance(batch, dict) else batch
                    x = shard_batch(self.mesh, x)
                    self.state, gm = self.gen_step(self.state, x, rng)
                    self.state, dm = self.disc_step(self.state, x, rng)
                    melk()   # deferred SIGUSR1 save, at a state-consistent point
                    # host-side counter (see train_ldm.fit): avoid a
                    # device sync on every just-dispatched step
                    step += 1
                    if image_logger is not None and image_logger.should_log(step):
                        from rangeldm_tpu.parallel.mesh import to_local_np
                        xrec = _recon(self.state.gen_params["vae"], x,
                                      jax.random.PRNGKey(step))
                        # multi-host: device_get on the global batch would
                        # raise (non-addressable shards); dump this
                        # process's slice like train_ldm's dumps do
                        image_logger.log(step, inputs=to_local_np(x),
                                         reconstructions=to_local_np(xrec))
                        melk()   # the recon dump blocks for a while; serve
                        # a signal that landed during it before stepping on
                    if step % log_every == 0 or (max_steps and step >= max_steps):
                        last = {k: float(v) for k, v in {**gm, **dm}.items()}
                        last["step"] = step
                        if loader is not None:
                            # input-pipeline health (see train_ldm.fit)
                            last["data_wait_frac"] = round(
                                float(getattr(loader, "wait_fraction", 0.0)),
                                4)
                        logger.log(step, last)
                    if step % ckpt_every == 0:
                        self.ckpt.save(step, jax.device_get(self.state))
                    if max_steps and step >= max_steps:
                        break
        finally:
            # flush the TensorBoard writer even on the crash path the
            # emergency checkpoint targets
            logger.close()
        return last

    def validate(self, batches, max_batches: int = 50) -> dict:
        """Reconstruction losses for live and EMA weights (the engine's
        _validation_step + ema_scope, autoencoder.py:223-256; reference caps
        at limit_val_batches 50)."""
        from rangeldm_tpu.training.vae_trainer import reconstruction_loss

        @jax.jit
        def rec(params, x, rng):
            xrec, _, _ = self.vae.apply({"params": params}, x, rng=rng)
            return jnp.mean(reconstruction_loss(x, xrec, self.loss_cfg))

        # process-local eval: on multi-host runs the params are committed
        # to the GLOBAL mesh, and this method runs on process 0 only — a
        # jit over globally-committed params would raise 'incompatible
        # devices' (or dispatch a collective no other process joins, while
        # they wait in save_final's barrier). Pull a host copy onto this
        # process's first device instead.
        dev = jax.local_devices()[0]
        live = jax.device_put(
            jax.device_get(self.state.gen_params["vae"]), dev)
        ema = self.state.ema_params
        if ema is not None:
            ema = jax.device_put(jax.device_get(ema), dev)
        totals = {"val/rec_loss": 0.0, "val/rec_loss_ema": 0.0}
        n = 0
        rng = jax.random.PRNGKey(1234)
        for batch in batches:
            if n >= max_batches:
                break
            x = jnp.asarray(batch["jpg"] if isinstance(batch, dict) else batch)
            rng, sub = jax.random.split(rng)
            totals["val/rec_loss"] += float(rec(live, x, sub))
            if ema is not None:
                totals["val/rec_loss_ema"] += float(rec(ema, x, sub))
            n += 1
        return {k: v / max(n, 1) for k, v in totals.items()}

    def save_final(self) -> str:
        """Write the VAE weights (live + EMA) as an orbax tree plus an
        sgm-format safetensors export for interchange."""
        import orbax.checkpoint as ocp
        from rangeldm_tpu.convert.export import (
            export_vae_state_dict, save_safetensors,
        )
        state = jax.device_get(self.state)
        path = os.path.join(self.out_dir, "vae_final")
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(path) + "/params",
                  jax.tree.map(np.asarray, state.gen_params["vae"]))
        ckpt.wait_until_finished()
        # the orbax save above is collective (every process participates);
        # the plain safetensors writes are not — two processes writing the
        # same shared-fs file can interleave, so only process 0 writes
        if jax.process_index() == 0:
            save_safetensors(
                export_vae_state_dict(state.gen_params["vae"]),
                os.path.join(self.out_dir, "vae_sgm.safetensors"))
            if state.ema_params is not None:
                save_safetensors(export_vae_state_dict(state.ema_params),
                                 os.path.join(self.out_dir,
                                              "vae_sgm_ema.safetensors"))
        return path


def main():
    from rangeldm_tpu.utils.cache import honor_jax_platforms_env
    honor_jax_platforms_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, nargs="+",
                    help="YAML config(s), merged left-to-right — later "
                         "files override (vae/main.py:632-636 convention)")
    ap.add_argument("--max_steps", type=int, default=None)
    args = ap.parse_args()
    from rangeldm_tpu.train_ldm import expand_env
    cfg = Cfg.wrap(expand_env(load_config(*args.cfg)))

    from rangeldm_tpu.data.datasets import (
        DatasetConfig, RangeImageDataset, RangeLoader,
    )
    dcfg = cfg.get("data", {})
    encoding = cfg.get("loss", {}).get("encoding", "linear")
    ds_config = DatasetConfig(
        root=dcfg.get("root", ""), sensor=dcfg.get("sensor", "kitti360"),
        width=int(dcfg.get("width", 1024)),
        used_feature=int(dcfg.get("used_feature", 2)),
        log=encoding == "log", inverse=encoding == "inverse",
        cache_compress=bool(dcfg.get("cache_compress", True)),
        mean=dcfg.get("mean"), std=dcfg.get("std"))
    ds = RangeImageDataset(ds_config, train=True)
    bs = int(cfg.get("batch_size", 16))
    loader = RangeLoader(ds, batch_size=bs,
                         shard_by_process=jax.process_count() > 1)

    trainer = VaeTrainer(cfg)
    trainer.resume()

    def epochs():
        while True:
            yield from loader

    total = int(cfg.get("max_epochs", 1000)) * len(loader)
    trainer.fit(epochs(), max_steps=args.max_steps or total,
                loader=loader)

    # post-fit test pass over the held-out split, mirroring
    # vae/main.py:905-906 `trainer.test(model, data)` (the reference's
    # test_dataloader serves the train=False drives); logs live + EMA
    # reconstruction losses and persists them next to the checkpoints.
    val_ds = RangeImageDataset(ds_config, train=False)
    if len(val_ds) and jax.process_index() == 0:
        val_loader = RangeLoader(val_ds, batch_size=bs, shuffle=False,
                                 drop_last=False)
        val = trainer.validate(val_loader)
        print("[val]", json.dumps(val))
        with open(os.path.join(trainer.out_dir, "val_metrics.json"),
                  "w") as f:
            json.dump({"step": int(trainer.state.step), **val}, f)

    trainer.save_final()


if __name__ == "__main__":
    main()
