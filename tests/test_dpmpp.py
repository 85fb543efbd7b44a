"""DPM-Solver++(2M) sampler (no reference counterpart — ldm/pipelines.py
ships DDPM/DDIM only; this is a capability on top: same trained weights,
~2.5x fewer UNet evaluations at matched quality).

Three independent checks:
  * a float64 numpy twin of the full multistep recursion (its own honest
    boundary handling: exact x0 at the sigma=0 final step) against the
    f32 lax.scan implementation, with a nonlinear synthetic denoiser —
    catches carry-threading / first-step / boundary bugs;
  * an analytic convergence-order test: for a Gaussian data distribution
    the optimal epsilon predictor and the exact probability-flow ODE
    endpoint are closed-form (the flow map of a linear ODE is affine:
    x0 = mu + s * (xT - m_T) / sqrt(v_T)), so solver error is measurable
    exactly — DPM++(2M) at 20 steps must beat DDIM at 20 steps by a wide
    margin and match DDIM at 50;
  * build_sampler plumbing: method='dpmpp' through the latent pipeline,
    including mesh-sharded vs single-device parity for the new scan carry.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rangeldm_tpu.diffusion.schedule import Schedule, ScheduleConfig
from rangeldm_tpu.pipelines.samplers import denoise

from test_sharded_sampling import _tiny_pipe, _assert_batch_sharded


def _np_dpmpp_2m(eps_fn, betas, ts, x, clip_sample=False):
    """Float64 scalar-loop DPM-Solver++(2M), data parametrization
    (arXiv:2211.01095), first-order on the first step and on the final
    sigma=0 boundary step (where it reduces to x = x0 exactly)."""
    acp = np.cumprod(1.0 - np.asarray(betas, np.float64))

    def a(t):
        return 1.0 if t < 0 else acp[t]

    def lam(t):
        return 0.5 * (np.log(a(t)) - np.log1p(-a(t)))

    ratio_steps = len(betas) // len(ts)
    x = np.asarray(x, np.float64)
    prev_x0, h_prev = None, None
    for i, t in enumerate(ts):
        tp = int(t) - ratio_steps
        eps = eps_fn(x, int(t))
        x0 = (x - np.sqrt(1 - a(t)) * eps) / np.sqrt(a(t))
        if clip_sample:
            x0 = np.clip(x0, -1.0, 1.0)
        if tp < 0:                      # sigma=0 boundary: limit of the
            x = x0                      # first-order update
            break
        h = lam(tp) - lam(t)
        phi = np.expm1(-h)
        first = (np.sqrt((1 - a(tp)) / (1 - a(t))) * x
                 - np.sqrt(a(tp)) * phi * x0)
        if prev_x0 is None:
            x = first
        else:
            d1 = (x0 - prev_x0) * (h / h_prev)
            x = first - 0.5 * np.sqrt(a(tp)) * phi * d1
        prev_x0, h_prev = x0, h
    return x


def test_dpmpp_numpy_twin(rng):
    """f32 lax.scan vs the float64 scalar loop, nonlinear denoiser."""
    sched = Schedule.create()
    n_steps = 12
    shape = (3, 4, 6, 2)
    x_init = np.asarray(rng.standard_normal(shape), np.float32)

    def eps_np(x, t):
        return np.tanh(x) * (0.5 + 0.3 * np.sin(t / 37.0)) + 0.05

    def eps_jax(x, t):
        return jnp.tanh(x) * (0.5 + 0.3 * jnp.sin(t / 37.0)) + 0.05

    got = np.asarray(denoise(eps_jax, sched, jnp.asarray(x_init), n_steps,
                             jax.random.PRNGKey(0), method="dpmpp"))
    want = _np_dpmpp_2m(eps_np, np.asarray(sched.betas), sched.timesteps(n_steps),
                        x_init)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def _gaussian_world_err(rng, s: float, method: str, n_steps: int,
                        spacing: str = "leading") -> float:
    """Mean |solver endpoint - exact PF-ODE endpoint| for x0 ~ N(mu, s^2).

    The optimal epsilon predictor is closed-form (linear-Gaussian
    posterior mean), the probability-flow ODE is linear, and a linear ODE
    transports Gaussian quantiles affinely — so the exact endpoint from
    any start point x_T is mu + s * (x_T - m_T) / sqrt(v_T), and solver
    error is measurable per sample with no training in the loop."""
    sched = Schedule.create(ScheduleConfig(timestep_spacing=spacing))
    mu = 1.3
    acp = sched.alphas_cumprod

    def eps_star(x, t):
        a = acp[t]
        v = a * s ** 2 + (1.0 - a)                      # marginal variance
        x0 = mu + (jnp.sqrt(a) * s ** 2 / v) * (x - jnp.sqrt(a) * mu)
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)

    x_init = jnp.asarray(rng.standard_normal((512, 1, 1, 1)), jnp.float32)
    t0 = int(sched.timesteps(n_steps)[0])
    a0 = float(acp[t0])
    exact = mu + s * (np.asarray(x_init, np.float64) - np.sqrt(a0) * mu) \
        / np.sqrt(a0 * s ** 2 + 1.0 - a0)
    got = np.asarray(denoise(eps_star, sched, x_init, n_steps,
                             jax.random.PRNGKey(0), method=method),
                     np.float64)
    return float(np.abs(got - exact).mean())


def test_dpmpp_beats_ddim_near_manifold(rng):
    """In the regime real data lives in (thin manifold: data sigma 0.1 <<
    unit noise), DPM++(2M) at 20 steps must beat DDIM at 20 steps by a
    wide margin AND beat DDIM at 50 steps — the basis for the '~2.5x
    fewer steps at matched quality' claim. Measured here: dpmpp20 9.5e-4
    vs ddim20 3.6e-2 (38x) and ddim50 ~1.5e-2."""
    e_ddim20 = _gaussian_world_err(rng, 0.1, "ddim", 20)
    e_ddim50 = _gaussian_world_err(rng, 0.1, "ddim", 50)
    e_dpmpp20 = _gaussian_world_err(rng, 0.1, "dpmpp", 20)
    print(f"[dpmpp] s=0.1 |err|: ddim20={e_ddim20:.2e} "
          f"ddim50={e_ddim50:.2e} dpmpp20={e_dpmpp20:.2e}")
    assert e_dpmpp20 < 0.25 * e_ddim20, (e_dpmpp20, e_ddim20)
    assert e_dpmpp20 < e_ddim50, (e_dpmpp20, e_ddim50)


def test_dpmpp_second_order_convergence(rng):
    """Solver-order check on a broad-Gaussian world (data sigma 0.7 —
    deliberately the hard case where few-step constants do NOT flatter
    dpmpp): doubling 250 -> 500 steps must cut dpmpp error ~4x (second
    order; gate 3x) while ddim cuts ~2x (first order; sanity bounds)."""
    e_d250 = _gaussian_world_err(rng, 0.7, "dpmpp", 250)
    e_d500 = _gaussian_world_err(rng, 0.7, "dpmpp", 500)
    e_e250 = _gaussian_world_err(rng, 0.7, "ddim", 250)
    e_e500 = _gaussian_world_err(rng, 0.7, "ddim", 500)
    print(f"[dpmpp] s=0.7 |err|: dpmpp 250={e_d250:.2e} 500={e_d500:.2e} "
          f"ddim 250={e_e250:.2e} 500={e_e500:.2e}")
    assert e_d500 < e_d250 / 3.0, (e_d250, e_d500)          # ~2nd order
    assert e_e250 / 3.0 < e_e500 < e_e250 / 1.5, (e_e250, e_e500)  # ~1st
    assert e_d500 < 0.2 * e_e500, (e_d500, e_e500)


def test_dpmpp_numpy_twin_clip_sample(rng):
    """clip_sample=True: the clipped-x0 interaction with the multistep
    D1 extrapolation (prev_x0 must be the CLIPPED prediction) against the
    twin. Early high-noise steps naturally drive |x0| >> 1, so the clip
    is active on this trajectory."""
    from rangeldm_tpu.diffusion.schedule import ScheduleConfig
    sched = Schedule.create(ScheduleConfig(clip_sample=True))
    n_steps = 12
    shape = (3, 4, 6, 2)
    x_init = np.asarray(2.0 * rng.standard_normal(shape), np.float32)

    def eps_np(x, t):
        return np.tanh(x) * (0.5 + 0.3 * np.sin(t / 37.0)) + 0.05

    def eps_jax(x, t):
        return jnp.tanh(x) * (0.5 + 0.3 * jnp.sin(t / 37.0)) + 0.05

    got = np.asarray(denoise(eps_jax, sched, jnp.asarray(x_init), n_steps,
                             jax.random.PRNGKey(0), method="dpmpp"))
    want = _np_dpmpp_2m(eps_np, np.asarray(sched.betas),
                        sched.timesteps(n_steps), x_init, clip_sample=True)
    unclipped = _np_dpmpp_2m(eps_np, np.asarray(sched.betas),
                             sched.timesteps(n_steps), x_init)
    assert np.abs(want - unclipped).max() > 1e-3   # the clip was active
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_trailing_spacing_numeric(rng):
    """Solver accuracy on the trailing grid (the claim-neutral option is
    still numerically pinned): on the broad world dpmpp-20 under trailing
    beats leading ~13x (measured 6.5e-3 vs 8.3e-2 — leading's large
    first-step lambda gap hurts the multistep extrapolation here), and
    n=61 exercises the NON-uniform trailing grid (the float-arange
    overshoot count) where only exact next-timestep (t, t_prev) pairing
    is correct — measured 1.6e-3, ~11x better than ddim on the same
    grid."""
    e_lead = _gaussian_world_err(np.random.default_rng(1), 0.7,
                                 "dpmpp", 20, "leading")
    e_trail = _gaussian_world_err(np.random.default_rng(1), 0.7,
                                  "dpmpp", 20, "trailing")
    assert e_trail < 0.25 * e_lead, (e_trail, e_lead)
    e61 = _gaussian_world_err(np.random.default_rng(1), 0.7,
                              "dpmpp", 61, "trailing")
    e61_ddim = _gaussian_world_err(np.random.default_rng(1), 0.7,
                                   "ddim", 61, "trailing")
    assert e61 < 0.25 * e61_ddim, (e61, e61_ddim)
    assert e61 < e_trail, (e61, e_trail)           # more steps, less error


def test_dpmpp_conditional_pipeline_api(rng):
    """method='dpmpp' through the conditional user API: RangePipeline
    .upsample -> _cond_sample -> build_conditional_sampler -> the dpmpp
    scan — the reference's conditional pipelines are DDIM-only
    (ldm/pipelines.py:386-519), so this is the capability surface."""
    from rangeldm_tpu.pipelines import RangePipeline
    pipe_d = _tiny_pipe(cond_channels=4, pos_encoding=False)
    rp = RangePipeline(dict(pipe_d), dtype=jnp.float32)
    down = rng.standard_normal((4, 4, 64, 2)).astype(np.float32)
    ddim = rp.upsample(down, num_inference_steps=3, seed=3, factor=2)
    dpmpp = rp.upsample(down, num_inference_steps=3, seed=3, factor=2,
                        method="dpmpp")
    assert ddim.shape == dpmpp.shape == (4, 8, 64, 2)
    assert np.isfinite(dpmpp).all()
    # the method reaches the solver (outputs differ) and the jit cache
    # keys by method (both programs coexist)
    assert np.abs(ddim - dpmpp).max() > 1e-4
    assert len(rp._fns) == 2


def test_build_sampler_dpmpp_latent_and_mesh_parity():
    """method='dpmpp' through the full latent pipeline (build_sampler ->
    latent_sample -> denoise -> VAE decode), single-device vs 8-device
    mesh — the new (x, prev_x0, h) scan carry must shard cleanly."""
    from rangeldm_tpu.parallel.mesh import make_mesh
    from rangeldm_tpu.sample_ldm import build_sampler
    pipe = _tiny_pipe(with_vae=True)
    rng = jax.random.PRNGKey(11)
    single = build_sampler(pipe, 8, num_steps=4, method="dpmpp",
                           dtype=jnp.float32)
    ref = single(rng)
    assert ref.shape == (8, 8, 64, 2)
    assert np.isfinite(np.asarray(ref)).all()
    # a different method must change the output (plumbing is live)
    ddim = build_sampler(pipe, 8, num_steps=4, dtype=jnp.float32)(rng)
    assert np.abs(np.asarray(ddim) - np.asarray(ref)).max() > 1e-4

    mesh = make_mesh(8)
    got = build_sampler(pipe, 8, num_steps=4, method="dpmpp",
                        dtype=jnp.float32, mesh=mesh)(rng)
    _assert_batch_sharded(got, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
