"""DDPM / DDIM noise schedules as pure JAX functions.

Math matches the diffusers `DDPMScheduler` / `DDIMScheduler` configuration
the reference trains and samples with (ldm/train_unconditional.py:345-354,
ldm/pipelines.py:139): 1000 linear betas 1e-4..0.02, epsilon prediction,
clip_sample=False, fixed-small variance, DDIM with set_alpha_to_one and
leading timestep spacing. Everything is shape-static and scan-friendly:
`timesteps()` returns a fixed (num_inference_steps,) descending array and the
step functions take (t, t_prev) index pairs so the whole denoise loop lives
inside one `lax.scan` (SURVEY.md section 7, idiomatic shift #1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    beta_schedule: str = "linear"          # 'linear' | 'scaled_linear' | 'squaredcos_cap_v2'
    prediction_type: str = "epsilon"       # 'epsilon' | 'v_prediction' | 'sample'
    clip_sample: bool = False
    set_alpha_to_one: bool = True          # DDIM final alpha_cumprod = 1
    steps_offset: int = 0
    # 'leading' is what the reference samples with (diffusers default);
    # 'trailing' (arXiv:2305.08891) starts at t = T-1 instead of ~T-T/n,
    # removing the first-step train/inference SNR mismatch — see timesteps()
    timestep_spacing: str = "leading"      # 'leading' | 'trailing'


def make_betas(cfg: ScheduleConfig) -> np.ndarray:
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float32)
    if cfg.beta_schedule == "scaled_linear":
        return np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, n,
                           dtype=np.float32) ** 2
    if cfg.beta_schedule == "squaredcos_cap_v2":
        def bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        ts = np.arange(n, dtype=np.float64)
        betas = 1.0 - bar((ts + 1) / n) / bar(ts / n)
        return np.minimum(betas, 0.999).astype(np.float32)
    raise ValueError(cfg.beta_schedule)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Schedule:
    """Precomputed schedule tensors. A pytree so it can close over jit."""
    cfg: ScheduleConfig
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray

    # --- pytree protocol (cfg is static) ---
    def tree_flatten(self):
        return (self.betas, self.alphas_cumprod), self.cfg

    @classmethod
    def tree_unflatten(cls, cfg, leaves):
        return cls(cfg, *leaves)

    @classmethod
    def create(cls, cfg: ScheduleConfig = ScheduleConfig()) -> "Schedule":
        betas = jnp.asarray(make_betas(cfg))
        return cls(cfg=cfg, betas=betas,
                   alphas_cumprod=jnp.cumprod(1.0 - betas))

    # ------------------------------------------------------------------
    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def _acp(self, t, final=None):
        """alpha_cumprod[t] with t < 0 -> final_alpha_cumprod (diffusers
        DDIM: 1.0 when set_alpha_to_one, else alphas_cumprod[0]). `final`
        overrides that boundary value — DDPM always uses 1.0 (diffusers
        DDPMScheduler `self.one`), the set_alpha_to_one knob is
        DDIM-only."""
        if final is None:
            final = (1.0 if self.cfg.set_alpha_to_one
                     else self.alphas_cumprod[0])
        safe = jnp.clip(t, 0, self.cfg.num_train_timesteps - 1)
        return jnp.where(t < 0, final, self.alphas_cumprod[safe])

    def _bc(self, v, ref):
        """broadcast (B,) scalars over trailing dims of ref."""
        return v.reshape(v.shape + (1,) * (ref.ndim - v.ndim)).astype(ref.dtype)

    # --- training ------------------------------------------------------
    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        a = self._bc(jnp.sqrt(self._acp(t)), x0)
        s = self._bc(jnp.sqrt(1.0 - self._acp(t)), x0)
        return a * x0 + s * noise

    def get_velocity(self, x0: jnp.ndarray, noise: jnp.ndarray,
                     t: jnp.ndarray) -> jnp.ndarray:
        a = self._bc(jnp.sqrt(self._acp(t)), x0)
        s = self._bc(jnp.sqrt(1.0 - self._acp(t)), x0)
        return a * noise - s * x0

    def snr(self, t: jnp.ndarray) -> jnp.ndarray:
        """compute_snr (ldm/train_unconditional.py:53-75)."""
        acp = self._acp(t)
        return acp / (1.0 - acp)

    def min_snr_weight(self, t: jnp.ndarray, gamma: float,
                       velocity: bool = False) -> jnp.ndarray:
        """Min-SNR loss weighting (arXiv:2303.09556;
        ldm/train_unconditional.py:527-543)."""
        snr = self.snr(t)
        if velocity:
            snr = snr + 1.0
        return jnp.minimum(snr, gamma) / snr

    # --- inference -----------------------------------------------------
    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """'leading' spacing: (arange(n) * (T // n)).round()[::-1] + offset
        — diffusers set_timesteps for both DDPM and DDIM, what the
        reference samples with. 'trailing': round(arange(T, 0, -T/n)) - 1
        (diffusers' other spacing, arXiv:2305.08891) — the trajectory
        starts at t = T-1 (full noise) instead of ~T - T/n, removing the
        leading spacing's train/inference SNR mismatch at the first step.
        Which wins at few steps is model-dependent (the analytic harness
        in tests/test_dpmpp.py measures both ways on different data
        regimes); the default matches the reference."""
        n = num_inference_steps
        T = self.cfg.num_train_timesteps
        if self.cfg.timestep_spacing == "trailing":
            # [:n]: float arange overshoots for 62 of the 1000 possible n
            # (e.g. n=61 yields 62 elements whose spurious tail rounds to
            # t=-1, which would crash the fixed-length scan / NaN ddpm)
            ts = (np.round(np.arange(T, 0, -T / n)) - 1)[:n]
            assert len(ts) == n, (len(ts), n)
            return ts.astype(np.int32)
        ratio = T // n
        ts = (np.arange(n) * ratio).round()[::-1]
        return (ts + self.cfg.steps_offset).astype(np.int32)

    def pred_x0(self, model_out, t, x):
        a = self._bc(self._acp(t), x)
        p = self.cfg.prediction_type
        if p == "epsilon":
            x0 = (x - jnp.sqrt(1 - a) * model_out) / jnp.sqrt(a)
            eps = model_out
        elif p == "v_prediction":
            x0 = jnp.sqrt(a) * x - jnp.sqrt(1 - a) * model_out
            eps = jnp.sqrt(a) * model_out + jnp.sqrt(1 - a) * x
        elif p == "sample":
            x0 = model_out
            eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        else:
            raise ValueError(p)
        if self.cfg.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
            eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        return x0, eps

    def ddpm_step(self, rng: jax.Array, model_out: jnp.ndarray,
                  t: jnp.ndarray, t_prev: jnp.ndarray,
                  x: jnp.ndarray) -> jnp.ndarray:
        """One ancestral DDPM step x_t -> x_{t_prev} (fixed_small variance).
        The t_prev < 0 boundary always uses alpha_prod_prev = 1.0: the
        DDIM-only set_alpha_to_one config must not leak into DDPM
        (diffusers DDPMScheduler.step uses `self.one` unconditionally)."""
        a_t = self._bc(self._acp(t), x)
        a_prev = self._bc(self._acp(t_prev, final=1.0), x)
        beta_prod = 1 - a_t
        beta_prod_prev = 1 - a_prev
        alpha_cur = a_t / a_prev
        beta_cur = 1 - alpha_cur

        x0, _ = self.pred_x0(model_out, t, x)
        coef_x0 = jnp.sqrt(a_prev) * beta_cur / beta_prod
        coef_xt = jnp.sqrt(alpha_cur) * beta_prod_prev / beta_prod
        mean = coef_x0 * x0 + coef_xt * x

        var = jnp.clip(beta_prod_prev / beta_prod * beta_cur, 1e-20, None)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        has_noise = self._bc((t > 0).astype(x.dtype), x)
        return mean + has_noise * jnp.sqrt(var) * noise

    # --- DPM-Solver++ (2M) ---------------------------------------------
    # Half-log-SNR cap standing in for lambda(t_prev < 0) = +inf at the
    # acp=1 final boundary: exp(-(40 - lam_s)) underflows to 0 in f32 for
    # every reachable lam_s, so expm1(-h) is exactly -1 there.
    _LAMBDA_MAX = 40.0

    def half_log_snr(self, t) -> jnp.ndarray:
        """lambda_t = log(alpha_t / sigma_t) = 0.5 * log(acp / (1 - acp)),
        the DPM-Solver time reparametrization (arXiv:2211.01095 eq. 4).
        t < 0 (final boundary, acp -> 1) maps to the finite _LAMBDA_MAX."""
        acp = jnp.clip(self._acp(t), 1e-20, 1.0 - 1e-7)
        lam = 0.5 * (jnp.log(acp) - jnp.log1p(-acp))
        return jnp.where(t < 0, self._LAMBDA_MAX, lam)

    def dpmpp_2m_step(self, model_out: jnp.ndarray, t: jnp.ndarray,
                      t_prev: jnp.ndarray, x: jnp.ndarray,
                      prev_x0: jnp.ndarray, h_prev: jnp.ndarray,
                      use_first_order: jnp.ndarray):
        """One DPM-Solver++(2M) multistep update x_t -> x_{t_prev}
        (arXiv:2211.01095, data-prediction parametrization, solver order 2).

        The first step of a trajectory and the final sigma=0 boundary step
        use the first-order update (the caller passes `use_first_order`;
        the boundary is detected here via t_prev < 0) — the multistep
        correction needs a previous x0 prediction, and at the boundary the
        extrapolation slope D1/h diverges. Interior steps add the
        0.5 * phi * D1 second-order correction, where D1 extrapolates the
        x0 prediction over the previous step size h_prev.

        Returns (x_prev, x0, h) so a lax.scan carry can thread the
        previous prediction and step size. This sampler has no reference
        counterpart (ldm/pipelines.py ships DDPM/DDIM only) — it is a
        capability on top: ~2.5x fewer UNet evaluations at matched sample
        quality.
        """
        x0, _ = self.pred_x0(model_out, t, x)
        # scalar coefficient math stays f32; _bc casts at application time
        acp_t = self._acp(t)
        acp_prev = self._acp(t_prev)
        h = self.half_log_snr(t_prev) - self.half_log_snr(t)
        ratio = jnp.sqrt((1.0 - acp_prev) / (1.0 - acp_t))  # sigma_prev/sigma_t
        phi = jnp.expm1(-h)                                 # in [-1, 0)
        alpha_prev = jnp.sqrt(acp_prev)
        first = self._bc(ratio, x) * x - self._bc(alpha_prev * phi, x) * x0
        # D1 = (x0 - prev_x0) / r0, r0 = h_prev / h; h_prev is seeded to 1
        # on the first step so the unselected branch stays finite (where
        # evaluates both sides)
        d1 = (x0 - prev_x0) * self._bc(h / h_prev, x)
        second = first - self._bc(0.5 * alpha_prev * phi, x) * d1
        w = self._bc(jnp.logical_or(use_first_order,
                                    t_prev < 0).astype(x.dtype), x)
        return w * first + (1.0 - w) * second, x0, h

    def ddim_step(self, model_out: jnp.ndarray, t: jnp.ndarray,
                  t_prev: jnp.ndarray, x: jnp.ndarray,
                  eta: float = 0.0,
                  rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """One DDIM step; eta=0 is deterministic."""
        a_t = self._bc(self._acp(t), x)
        a_prev = self._bc(self._acp(t_prev), x)
        x0, eps = self.pred_x0(model_out, t, x)
        if eta > 0.0:
            var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
            std = eta * jnp.sqrt(var)
        else:
            std = 0.0
        direction = jnp.sqrt(1 - a_prev - std ** 2 if eta > 0 else 1 - a_prev) * eps
        prev = jnp.sqrt(a_prev) * x0 + direction
        if eta > 0.0:
            assert rng is not None
            prev = prev + std * jax.random.normal(rng, x.shape, x.dtype)
        return prev
