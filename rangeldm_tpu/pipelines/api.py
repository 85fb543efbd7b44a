"""User-facing pipeline API — the `DiffusionPipeline.from_pretrained`
convenience surface of the reference (ldm/pipelines.py: DDPMPipelineRange /
DDIMPipelineRange / LDMPipelineRange / LDMUpscalePipelineRange all inherit
save/from_pretrained from diffusers) on top of the functional samplers.

    from rangeldm_tpu.pipelines import RangePipeline
    pipe = RangePipeline.from_pretrained("runs/rangeldm_kitti360/pipeline")
    images = pipe(batch_size=16, num_inference_steps=50, seed=0)
    clouds = pipe.to_point_clouds(images)

    up = RangePipeline.from_pretrained("runs/upsample/pipeline")
    dense = up.upsample(sparse_images)          # 4x beam densification
    inp = RangePipeline.from_pretrained("runs/inpainting/pipeline")
    filled = inp.inpaint(masked_images, masks)  # azimuth-sector inpainting

Accepts both our orbax pipeline dirs and released HF diffusers dirs
(load_any_pipeline routes by layout). Jitted programs are cached per
(kind, batch, steps, method) so repeated calls run at device speed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RangePipeline:
    def __init__(self, pipe: dict, sensor: Optional[str] = None,
                 dtype=jnp.bfloat16, spec=None, mesh=None,
                 mesh_auto: bool = False):
        self._p = pipe
        # sensor=None defers to the artifact's own record (train_ldm
        # save_final writes meta['sensor']), falling back to kitti360 for
        # hand-built pipes and released HF dirs that predate the key
        self.sensor = sensor or (pipe.get("meta") or {}).get(
            "sensor", "kitti360")
        self.dtype = dtype
        self._spec = spec          # explicit SensorSpec override
        self.mesh = mesh           # shard every sample batch over this mesh
        # mesh came from "auto": adapt per call to the batch size (largest
        # device prefix that divides it) instead of raising on the default
        # batch_size=1 — the same policy as the CLI's --mesh_devices auto
        self._mesh_auto = mesh_auto
        self._submeshes = {}
        self._fns = {}

    # -- construction ---------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str, sensor: Optional[str] = None,
                        dtype=jnp.bfloat16, use_ema: bool = True,
                        spec=None, mesh=None) -> "RangePipeline":
        """`sensor` defaults to the artifact's own meta['sensor'] record
        (kitti360 when absent); `spec` overrides the registry sensor
        lookup with an explicit SensorSpec (custom beam tables /
        reduced-resolution models).

        `mesh` (single-axis jax.sharding.Mesh, or the string "auto" for all
        local chips) makes every generation call a mesh-sharded program:
        batch over chips, params replicated — so inference uses the whole
        host like the reference's 8-GPU PartialState (ldm/inference.py:56).
        With an explicit Mesh, batch sizes must be multiples of the mesh
        size; "auto" instead adapts per call — each generation uses the
        largest device prefix that divides its batch (batch_size=1 simply
        runs single-device), the CLI's --mesh_devices auto policy."""
        from rangeldm_tpu.sample_ldm import load_any_pipeline
        from rangeldm_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        mesh_auto = False
        if isinstance(mesh, str):
            if mesh != "auto":
                raise ValueError("mesh must be a Mesh, None, or 'auto'")
            # THIS process's devices (like the CLI's resolve_sampling_mesh):
            # make_mesh slices jax.devices(), which on a multi-host pod
            # would hand every process host 0's (non-addressable) chips
            from jax.sharding import Mesh
            local = jax.local_devices()
            mesh = (Mesh(np.asarray(local), ("data",))
                    if len(local) > 1 else None)
            mesh_auto = mesh is not None
        return cls(load_any_pipeline(path, dtype=dtype, use_ema=use_ema),
                   sensor=sensor, dtype=dtype, spec=spec, mesh=mesh,
                   mesh_auto=mesh_auto)

    # -- introspection --------------------------------------------------
    @property
    def unet_config(self):
        return self._p["unet_cfg"]

    @property
    def is_latent(self) -> bool:
        return self._p["vae"] is not None

    @property
    def cond_channels(self) -> int:
        from rangeldm_tpu.sample_ldm import pipe_pos_encoding
        cfg = self._p["unet_cfg"]
        pos = 1 if pipe_pos_encoding(self._p) else 0
        return cfg.in_channels - cfg.out_channels - pos

    @property
    def vae_down_factor(self) -> int:
        """Spatial image->latent factor of the attached VAE (2 per
        downsample level)."""
        if not self.is_latent:
            return 1
        return self._p["vae_cfg"].down_factor

    @property
    def sensor(self) -> str:
        return self._sensor

    @sensor.setter
    def sensor(self, value: str):
        """Changing the sensor after construction invalidates the cached
        (or constructor-override) spec so the next `spec` access re-derives
        it — a stale cached spec would silently back-project with the old
        sensor's beam tables (ADVICE r4)."""
        if getattr(self, "_sensor", None) not in (None, value):
            self._spec = None
        self._sensor = value

    @property
    def spec(self):
        if self._spec is not None:
            return self._spec
        from rangeldm_tpu.geometry import get_spec
        from rangeldm_tpu.sample_ldm import (
            adapt_spec_to_model, apply_meta_normalization, pipe_image_size,
        )
        # adapt to the MODEL's (H, W) like the sampling CLI: a reduced-
        # resolution model against the sensor's full beam table would
        # crash to_point_clouds with an opaque broadcast error. Cache the
        # result: it is immutable, and adapt_spec_to_model prints a
        # one-line note for reduced models that would otherwise repeat on
        # every to_point_clouds() call.
        self._spec = apply_meta_normalization(
            adapt_spec_to_model(get_spec(self.sensor),
                                pipe_image_size(self._p)),
            self._p.get("meta"))
        return self._spec

    def _mesh_for_batch(self, batch_size: int):
        """The mesh a generation call with this batch size runs on. An
        explicit user Mesh is strict (non-divisible batches get the clear
        error from _sampling_mesh_shardings); 'auto' adapts — the largest
        device prefix of the local mesh that divides the batch, None
        (single-device) when nothing does."""
        if self.mesh is None or not self._mesh_auto:
            return self.mesh
        from rangeldm_tpu.parallel.mesh import largest_divisible_prefix
        devs = list(self.mesh.devices.flat)
        n = largest_divisible_prefix(len(devs), batch_size)
        if n <= 1:
            return None
        if n == len(devs):
            return self.mesh
        if n not in self._submeshes:
            from jax.sharding import Mesh
            self._submeshes[n] = Mesh(np.asarray(devs[:n]), ("data",))
        return self._submeshes[n]

    def _ensure_replicated(self, mesh=None):
        """Replicate the model params onto the full mesh ONCE, storing them
        back into the pipe dict: every cached sampler variant then shares
        the same device buffers (device_put on an already-identically-
        sharded array is a no-op), instead of each (batch, steps, method)
        cache miss holding its own replicated copy of the UNet+VAE weights
        in HBM. Sub-meshes from _mesh_for_batch skip the store-back — the
        sampler builders replicate into their own closures."""
        mesh = self.mesh if mesh is None else mesh
        if mesh is None or mesh is not self.mesh or self._p.get("_replicated"):
            return
        from rangeldm_tpu.parallel.mesh import replicate
        self._p["unet_params"] = replicate(self.mesh, self._p["unet_params"])
        if self._p.get("vae_params") is not None:
            self._p["vae_params"] = replicate(self.mesh,
                                              self._p["vae_params"])
        self._p["_replicated"] = True

    # -- unconditional generation --------------------------------------
    def __call__(self, batch_size: int = 1, num_inference_steps: int = 50,
                 seed: int = 0, rng: Optional[jax.Array] = None,
                 method: str = "ddim", final_only: bool = True):
        """Generate `batch_size` range images (B, H, W, C), normalized
        (LDMPipelineRange/DDIMPipelineRange __call__). final_only=False
        additionally returns the decoded per-step denoising trajectory
        (num_steps, B, H, W, C) — ldm/pipelines.py:350-355 — latent
        pipelines only. method: 'ddim' (reference), 'ddpm', or 'dpmpp'
        (DPM-Solver++ 2M — try num_inference_steps=20)."""
        if self.cond_channels > 0:
            raise ValueError("conditional pipeline: use .upsample() / "
                             ".inpaint() instead of __call__")
        if rng is None:
            rng = jax.random.PRNGKey(seed)
        mesh = self._mesh_for_batch(batch_size)
        self._ensure_replicated(mesh)
        if not final_only:
            if not self.is_latent:
                raise ValueError("final_only=False needs a latent pipeline")
            from rangeldm_tpu.pipelines.samplers import latent_sample
            p, cfg = self._p, self._p["unet_cfg"]
            h, w = cfg.sample_size
            key = ("traj", batch_size, num_inference_steps, method)
            fn = self._fns.get(key)
            if fn is None:
                from rangeldm_tpu.sample_ldm import (
                    _sampling_mesh_shardings, pipe_pos_encoding)
                data_shd, _ = _sampling_mesh_shardings(mesh, batch_size)
                up, vp = p["unet_params"], p["vae_params"]
                if mesh is not None:
                    # no-op when _ensure_replicated already stored the
                    # full-mesh copy back; a real device_put on sub-meshes
                    from rangeldm_tpu.parallel.mesh import replicate
                    up = replicate(mesh, up)
                    vp = replicate(mesh, vp)

                def traj_fn(r):
                    return latent_sample(
                        lambda x, t: p["unet"].apply(up, x, t),
                        lambda z: p["vae"].apply(vp, z, method="decode"),
                        p["schedule"], r,
                        (batch_size, h, w, cfg.out_channels),
                        p["vae_cfg"].scaling_factor,
                        num_steps=num_inference_steps, method=method,
                        pos_encoding=pipe_pos_encoding(p),
                        final_only=False, dtype=self.dtype,
                        sharding=data_shd)
                fn = self._fns[key] = jax.jit(traj_fn)
            image, traj = fn(rng)
            return (np.asarray(image, np.float32),
                    np.asarray(traj, np.float32))
        from rangeldm_tpu.sample_ldm import build_sampler
        key = ("u", batch_size, num_inference_steps, method)
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = build_sampler(
                self._p, batch_size, num_inference_steps, method,
                dtype=self.dtype, mesh=mesh)
        return np.asarray(fn(rng), np.float32)

    # -- conditional generation ----------------------------------------
    def _cond_sample(self, cond_inputs: dict, mode: str, num_steps: int,
                     rng: jax.Array, factor: int,
                     method: str = "ddim") -> np.ndarray:
        from rangeldm_tpu.sample_conditional import build_conditional_sampler
        bs = next(iter(cond_inputs.values())).shape[0]
        mesh = self._mesh_for_batch(bs)
        self._ensure_replicated(mesh)
        key = (mode, bs, num_steps, factor, method)
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = build_conditional_sampler(
                self._p, bs, mode, num_steps, factor, dtype=self.dtype,
                mesh=mesh, method=method)
        return np.asarray(fn(rng, cond_inputs), np.float32)

    def upsample(self, sparse_images, num_inference_steps: int = 50,
                 seed: int = 0, rng: Optional[jax.Array] = None,
                 factor: Optional[int] = None,
                 method: str = "ddim") -> np.ndarray:
        """Beam densification (LDMUpscalePipelineRange with the
        SparseRangeImageEncoder2 condition): sparse (B, H/f, W, C) ->
        dense (B, H, W, C). `factor` defaults to cond_channels / C and is
        validated against the model's condition-channel count: the pixel
        unshuffle produces exactly factor*C channels, so anything else
        would feed the UNet a silently-wrong condition
        (ldm/encoders.py:86-95 SparseRangeImageEncoder2)."""
        sparse_images = jnp.asarray(sparse_images)
        c = sparse_images.shape[-1]
        if factor is None:
            factor = max(self.cond_channels // c, 1)
        if factor * c != self.cond_channels:
            want = (self.cond_channels // c if self.cond_channels % c == 0
                    else self.cond_channels / c)
            raise ValueError(
                f"upsample factor {factor} x {c} input channels != the "
                f"model's {self.cond_channels} condition channels; this "
                f"model expects factor={want} or a different input channel "
                f"count (used_feature)")
        if rng is None:
            rng = jax.random.PRNGKey(seed)
        return self._cond_sample({"down": sparse_images}, "upsample",
                                 num_inference_steps, rng, factor,
                                 method=method)

    def inpaint(self, masked_images, masks, num_inference_steps: int = 50,
                seed: int = 0, rng: Optional[jax.Array] = None,
                method: str = "ddim") -> np.ndarray:
        """Azimuth-sector inpainting (masked-image latent + resized mask
        condition, ldm/pipelines.py:406-412). The mask's latent-resolution
        resize factor is the VAE's own down factor (the sampler derives it
        from the VAE config; no user knob — it is not a free parameter)."""
        if rng is None:
            rng = jax.random.PRNGKey(seed)
        return self._cond_sample(
            {"masked_image": jnp.asarray(masked_images),
             "inpainting_mask": jnp.asarray(masks)},
            "inpainting", num_inference_steps, rng,
            factor=self.vae_down_factor, method=method)

    # -- post-processing ------------------------------------------------
    def to_point_clouds(self, images, max_depth: float = 90.0):
        """Back-project generated images -> list of (N, 3/4) clouds with
        the depth filter of ldm/inference.py:173-177."""
        from rangeldm_tpu.geometry.inverse import to_point_cloud_masked
        pcs, valid = to_point_cloud_masked(
            jnp.asarray(images, jnp.float32), self.spec, max_depth=max_depth)
        pcs, valid = np.asarray(pcs), np.asarray(valid)
        return [pcs[i][valid[i]] for i in range(len(pcs))]

    def save_outputs(self, images, out_dir: str, start_idx: int = 0):
        """Write the {i}.bin / {i}_bev.png / {i}_range.png layout the
        evaluation CLI consumes."""
        from rangeldm_tpu.sample_ldm import save_outputs
        save_outputs(np.asarray(images, np.float32), self.spec, out_dir,
                     start_idx)
