"""VAE reconstruction evaluation CLI (T5 + the convert_vae.py:193-271
__main__ eval): MAE / PSNR over normalized images + symmetric Chamfer
distance over back-projected point clouds on held-out scans; optional
input/output dump for visual inspection (vae/inference_range_image_kitti.py).

    python -m rangeldm_tpu.eval_vae --vae runs/vae_kitti360/vae_final \
        --data $KITTI360_DATASET --count 1000
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from rangeldm_tpu.data.datasets import DatasetConfig, RangeImageDataset, RangeLoader
from rangeldm_tpu.geometry import get_spec, to_point_cloud
from rangeldm_tpu.metrics.chamfer import chamfer_distance
from rangeldm_tpu.models.vae import AutoencoderKL, VaeConfig
from rangeldm_tpu.utils.cache import enable_compilation_cache


def load_vae(path: str, cfg: VaeConfig, image_size=(64, 1024)):
    """One loader for every VAE artifact — delegates to
    train_ldm.load_vae_params, which handles sgm .ckpt / exported
    .safetensors (converter; no template init needed), vae_final dirs,
    and pipeline dirs (<dir>/vae/params). The old local copy eagerly ran
    the minutes-long CPU init even on the converter branch that throws
    the template away."""
    from rangeldm_tpu.train_ldm import load_vae_params
    vae = AutoencoderKL(cfg)
    shape = (image_size[0], image_size[1], cfg.in_channels)
    return vae, load_vae_params(vae, path, shape)


def evaluate(vae, params, batches, spec, count: int = 1000,
             sample_posterior: bool = True, seed: int = 0) -> dict:
    @jax.jit
    def recon(x, rng):
        xrec, _, _ = vae.apply(params, x, rng=rng,
                               sample_posterior=sample_posterior)
        return xrec

    mae = psnr = cd = 0.0
    seen = 0
    rng = jax.random.PRNGKey(seed)
    for batch in batches:
        x = jnp.asarray(batch["jpg"])
        rng, sub = jax.random.split(rng)
        xrec = recon(x, sub)
        # normalize both to [0, 1] in true range (convert_vae.py:239-246)
        def to_unit(v):
            r = (v[..., 0] * spec.std + spec.mean) / spec.range_fill
            return jnp.stack([r, v[..., 1]], axis=-1)
        xu, ru = to_unit(x), to_unit(xrec)
        take = min(x.shape[0], count - seen)   # keep all metrics on the
        err = jnp.mean(jnp.abs(xu - ru), axis=(1, 2, 3))[:take]
        mse = jnp.mean((xu - ru) ** 2, axis=(1, 2, 3))[:take]
        mae += float(jnp.sum(err))
        psnr += float(jnp.sum(10 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))))

        pc_in = to_point_cloud(x, spec)
        pc_out = to_point_cloud(xrec, spec)
        for j in range(x.shape[0]):
            if seen + j >= count:
                break
            a, b = pc_in[j, :, :3], pc_out[j, :, :3]
            av = jnp.linalg.norm(a, axis=1) < 70.0
            bv = jnp.linalg.norm(b, axis=1) < 70.0
            cd += float(chamfer_distance(a, b, av, bv))
        seen += take
        if seen >= count:
            break
    if seen == 0:
        raise SystemExit("no held-out eval scans found (check --data: the "
                         "eval split is drives 0000/0002)")
    n = min(seen, count)
    return {"mae": mae / n, "psnr": psnr / n, "chamfer": cd / n, "count": n}


def main():
    from rangeldm_tpu.utils.cache import honor_jax_platforms_env
    honor_jax_platforms_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae", required=True)
    ap.add_argument("--data", default=os.environ.get("KITTI360_DATASET", ""))
    ap.add_argument("--sensor", default="kitti360")
    ap.add_argument("--count", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=4)
    args = ap.parse_args()

    enable_compilation_cache()
    spec = get_spec(args.sensor)
    vae, params = load_vae(args.vae, VaeConfig())
    ds = RangeImageDataset(DatasetConfig(root=args.data, sensor=args.sensor),
                           train=False)
    loader = RangeLoader(ds, batch_size=args.batch_size, shuffle=True)
    out = evaluate(vae, params, loader, spec, count=args.count)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
