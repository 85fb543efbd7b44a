"""Scheduler golden tests vs an independent numpy implementation of the
published DDPM (Ho et al. 2020, eq. 4/6/7) and DDIM (Song et al. 2020,
eq. 12) formulas, in the diffusers configuration the reference uses."""

import numpy as np
import jax
import jax.numpy as jnp

from rangeldm_tpu.diffusion.schedule import Schedule, ScheduleConfig
from rangeldm_tpu.pipelines.samplers import (
    denoise, ddim_sample, make_pos_encoding,
)


def np_schedule():
    betas = np.linspace(1e-4, 0.02, 1000, dtype=np.float64)
    return betas, np.cumprod(1 - betas)


def test_betas_and_timesteps():
    s = Schedule.create()
    betas, acp = np_schedule()
    np.testing.assert_allclose(np.asarray(s.betas), betas.astype(np.float32),
                               rtol=1e-6)
    ts = s.timesteps(50)
    assert ts[0] == 980 and ts[-1] == 0 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_trailing_timestep_spacing():
    """timestep_spacing='trailing' (arXiv:2305.08891; diffusers grammar
    round(arange(T, 0, -T/n)) - 1): starts at t = T-1, ends near 0, and
    the denoise scan pairs each t with the actual next timestep (exact
    for non-uniform spacings, -1 boundary at the end)."""
    from rangeldm_tpu.pipelines.samplers import _scan_ts
    s = Schedule.create(ScheduleConfig(timestep_spacing="trailing"))
    ts = s.timesteps(20)
    want = (np.round(np.arange(1000, 0, -50)) - 1).astype(np.int32)
    np.testing.assert_array_equal(ts, want)
    assert ts[0] == 999 and len(ts) == 20
    # non-divisible count: still T-1 first, strictly falling, EXACTLY n
    # entries — the float arange overshoots for 62 of the 1000 possible
    # step counts (n=61 etc.) and the spurious t=-1 tail must be cut
    for n in (12, 61, 103, 122):
        tsn = s.timesteps(n)
        assert len(tsn) == n and tsn[0] == 999 and tsn[-1] >= 0, (n, tsn)
        assert np.all(np.diff(tsn) < 0)
    a, b = _scan_ts(s, 12)
    np.testing.assert_array_equal(np.asarray(b)[:-1], np.asarray(a)[1:])
    assert int(np.asarray(b)[-1]) == -1
    # the full scan runs under the trailing grid for every method
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 2), jnp.float32)
    for method in ("ddim", "ddpm", "dpmpp"):
        out = denoise(lambda z, t: 0.1 * z, s, x, 6, rng, method=method)
        assert np.isfinite(np.asarray(out)).all(), method


def test_add_noise_golden():
    s = Schedule.create()
    _, acp = np_schedule()
    x0 = np.full((2, 3, 4, 1), 0.7, np.float32)
    noise = np.full((2, 3, 4, 1), -0.2, np.float32)
    t = np.array([0, 999])
    out = np.asarray(s.add_noise(jnp.asarray(x0), jnp.asarray(noise),
                                 jnp.asarray(t)))
    for b, ti in enumerate(t):
        expect = np.sqrt(acp[ti]) * 0.7 + np.sqrt(1 - acp[ti]) * -0.2
        np.testing.assert_allclose(out[b], expect.astype(np.float32),
                                   rtol=1e-5)


def test_ddim_step_golden():
    """DDIM eta=0 closed form: x_prev = sqrt(a_prev) x0 + sqrt(1-a_prev) eps."""
    s = Schedule.create()
    _, acp = np_schedule()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
    t, tp = 980, 960
    out = np.asarray(s.ddim_step(jnp.asarray(eps), jnp.asarray(t),
                                 jnp.asarray(tp), jnp.asarray(x)))
    x0 = (x - np.sqrt(1 - acp[t]) * eps) / np.sqrt(acp[t])
    expect = np.sqrt(acp[tp]) * x0 + np.sqrt(1 - acp[tp]) * eps
    np.testing.assert_allclose(out, expect.astype(np.float32), rtol=2e-4,
                               atol=2e-5)


def test_ddim_final_step_alpha_one():
    """t_prev < 0 uses final_alpha_cumprod = 1 (set_alpha_to_one=True):
    x_prev == pred_x0 exactly."""
    s = Schedule.create()
    _, acp = np_schedule()
    x = np.ones((1, 2, 2, 1), np.float32) * 0.3
    eps = np.ones_like(x) * 0.1
    out = np.asarray(s.ddim_step(jnp.asarray(eps), jnp.asarray(0),
                                 jnp.asarray(-20), jnp.asarray(x)))
    x0 = (x - np.sqrt(1 - acp[0]) * eps) / np.sqrt(acp[0])
    np.testing.assert_allclose(out, x0.astype(np.float32), rtol=1e-5, atol=1e-6)


def test_ddpm_step_golden_mean():
    """DDPM posterior mean (Ho et al. eq. 7) checked at t=0 where no noise is
    added."""
    s = Schedule.create()
    betas, acp = np_schedule()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 4, 1)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 1)).astype(np.float32)
    t, tp = 0, -1
    out = np.asarray(s.ddpm_step(jax.random.PRNGKey(0), jnp.asarray(eps),
                                 jnp.asarray(t), jnp.asarray(tp),
                                 jnp.asarray(x)))
    a_t, a_prev = acp[0], 1.0
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    cur_beta = 1 - a_t / a_prev
    coef0 = np.sqrt(a_prev) * cur_beta / (1 - a_t)
    coef1 = np.sqrt(a_t / a_prev) * (1 - a_prev) / (1 - a_t)
    np.testing.assert_allclose(out, (coef0 * x0 + coef1 * x).astype(np.float32),
                               rtol=2e-4, atol=1e-5)


def test_ddpm_variance_matches_fixed_small():
    """Statistical check of the fixed_small variance over many draws."""
    s = Schedule.create()
    betas, acp = np_schedule()
    t, tp = 500, 480
    x = jnp.zeros((4096, 1, 1, 1))
    eps = jnp.zeros_like(x)
    out = np.asarray(s.ddpm_step(jax.random.PRNGKey(3), eps,
                                 jnp.asarray(t), jnp.asarray(tp), x))
    var = (1 - acp[tp]) / (1 - acp[t]) * (1 - acp[t] / acp[tp])
    assert abs(out.std() - np.sqrt(var)) < 0.05 * np.sqrt(var)


def test_v_prediction_identities():
    s = Schedule.create(ScheduleConfig(prediction_type="v_prediction"))
    _, acp = np_schedule()
    rng = np.random.default_rng(3)
    x0 = rng.standard_normal((1, 2, 2, 1)).astype(np.float32)
    noise = rng.standard_normal((1, 2, 2, 1)).astype(np.float32)
    t = jnp.asarray([700])
    xt = s.add_noise(jnp.asarray(x0), jnp.asarray(noise), t)
    v = s.get_velocity(jnp.asarray(x0), jnp.asarray(noise), t)
    rec_x0, rec_eps = s.pred_x0(v, t, xt)
    np.testing.assert_allclose(np.asarray(rec_x0)[0], x0[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rec_eps)[0], noise[0], rtol=1e-3, atol=1e-4)


def test_min_snr_weight():
    s = Schedule.create()
    _, acp = np_schedule()
    t = jnp.asarray([10, 990])
    w = np.asarray(s.min_snr_weight(t, gamma=5.0))
    snr = acp[[10, 990]] / (1 - acp[[10, 990]])
    np.testing.assert_allclose(w, np.minimum(snr, 5.0) / snr, rtol=1e-4)


def test_denoise_scan_matches_python_loop():
    """The lax.scan loop must equal an explicit Python loop of steps."""
    s = Schedule.create()

    def model_fn(x, t):
        # a fake epsilon model: deterministic function of x and t
        return 0.1 * x + 0.01 * jnp.asarray(t, x.dtype)

    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 2))
    out_scan = denoise(model_fn, s, x0, 10, rng, method="ddim")

    ts = s.timesteps(10)
    x = x0
    r = rng
    for t in ts:
        eps = model_fn(x, jnp.asarray(t))
        r, sub = jax.random.split(r)
        x = s.ddim_step(eps, jnp.asarray(t), jnp.asarray(t - 100), x)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(x),
                               rtol=1e-5, atol=1e-6)


def test_pos_encoding_layout():
    pos = np.asarray(make_pos_encoding(2, 16, 256))
    assert pos.shape == (2, 16, 256, 1)
    assert pos[:, :, 0, :].min() == 1.0
    assert pos[:, :, 1:, :].max() == 0.0


def test_denoise_trajectory_collection():
    s = Schedule.create()

    def model_fn(x, t):
        return 0.1 * x

    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 2))
    final, traj = denoise(model_fn, s, x0, 5, rng, collect_trajectory=True)
    assert traj.shape == (5, 2, 4, 8, 2)
    # first trajectory entry is the initial state; final != last entry
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(x0), rtol=1e-6)
    only = denoise(model_fn, s, x0, 5, rng)
    np.testing.assert_allclose(np.asarray(final), np.asarray(only), rtol=1e-6)


def test_ddim_step_eta_positive_variance_formula(rng):
    """eta>0 branch (DDIMScheduler._get_variance):
    var = (1-a_prev)/(1-a_t) * (1 - a_t/a_prev); the stochastic step is
    sqrt(a_prev) x0 + sqrt(1 - a_prev - eta^2 var) eps + eta sqrt(var) z."""
    import jax
    sch = Schedule.create(ScheduleConfig())
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 3), dtype=np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 8, 3), dtype=np.float32))
    t, tp = jnp.asarray(801), jnp.asarray(781)
    eta = 0.7
    key = jax.random.PRNGKey(0)
    got = np.asarray(sch.ddim_step(eps, t, tp, x, eta=eta, rng=key))

    acp = np.asarray(sch.alphas_cumprod)
    a_t, a_prev = acp[801], acp[781]
    x0 = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    std = eta * np.sqrt(var)
    z = np.asarray(jax.random.normal(key, x.shape, x.dtype))
    want = (np.sqrt(a_prev) * x0 +
            np.sqrt(1 - a_prev - std ** 2) * np.asarray(eps) + std * z)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ddim_eta_zero_vs_positive(rng):
    """eta=0 is deterministic; eta>0 differs across rng keys but agrees for
    the same key; eta=1 variance matches the DDPM posterior variance."""
    import jax
    sch = Schedule.create(ScheduleConfig())
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 2), dtype=np.float32))
    eps = jnp.asarray(rng.standard_normal((1, 4, 8, 2), dtype=np.float32))
    t, tp = jnp.asarray(501), jnp.asarray(481)
    d0a = np.asarray(sch.ddim_step(eps, t, tp, x, eta=0.0))
    d0b = np.asarray(sch.ddim_step(eps, t, tp, x, eta=0.0,
                                   rng=jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(d0a, d0b)   # rng ignored at eta=0
    s1 = np.asarray(sch.ddim_step(eps, t, tp, x, eta=0.5,
                                  rng=jax.random.PRNGKey(1)))
    s2 = np.asarray(sch.ddim_step(eps, t, tp, x, eta=0.5,
                                  rng=jax.random.PRNGKey(2)))
    s1b = np.asarray(sch.ddim_step(eps, t, tp, x, eta=0.5,
                                   rng=jax.random.PRNGKey(1)))
    assert not np.allclose(s1, s2)
    np.testing.assert_array_equal(s1, s1b)
    assert np.abs(s1 - d0a).max() > 0

    # eta=1: the injected noise's std must equal sqrt(beta_t~), the DDPM
    # posterior std — recover it from two eta=1 draws whose keys are known
    # (step(eta=1) = deterministic part + std * normal(key))
    acp = np.asarray(sch.alphas_cumprod)
    var = (1 - acp[481]) / (1 - acp[501]) * (1 - acp[501] / acp[481])
    k = jax.random.PRNGKey(3)
    s_eta1 = np.asarray(sch.ddim_step(eps, t, tp, x, eta=1.0, rng=k))
    z = np.asarray(jax.random.normal(k, x.shape, x.dtype))
    a_t, a_prev = acp[501], acp[481]
    x0 = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    det = (np.sqrt(a_prev) * x0 +
           np.sqrt(1 - a_prev - var) * np.asarray(eps))
    implied_std = (s_eta1 - det) / z
    np.testing.assert_allclose(implied_std, np.sqrt(var), rtol=1e-4,
                               atol=1e-5)


def test_denoise_eta_positive_end_to_end(rng):
    """The sampling loop accepts eta>0 and stays finite (untested in r1)."""
    import jax
    from rangeldm_tpu.pipelines.samplers import ddim_sample
    sch = Schedule.create(ScheduleConfig())

    def model_fn(x, t):
        return 0.1 * x[..., :2]

    out = ddim_sample(model_fn, sch, jax.random.PRNGKey(0), (2, 4, 8, 2),
                      num_steps=5, eta=0.8)
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_final_alpha_respects_set_alpha_to_one():
    """diffusers DDIM: final_alpha_cumprod is alphas_cumprod[0] when
    set_alpha_to_one=false — the last step (t_prev < 0) must differ from
    the set_alpha_to_one=true schedule (regression: the flag was parsed
    but ignored)."""
    import numpy as np
    import jax.numpy as jnp
    from rangeldm_tpu.diffusion.schedule import Schedule, ScheduleConfig

    s1 = Schedule.create(ScheduleConfig(set_alpha_to_one=True))
    s0 = Schedule.create(ScheduleConfig(set_alpha_to_one=False))
    x = jnp.ones((1, 2, 2, 1)) * 0.3
    eps = jnp.ones_like(x) * 0.1
    t = jnp.array([19])
    tp = jnp.array([-1])
    a1 = np.asarray(s1.ddim_step(eps, t, tp, x))
    a0 = np.asarray(s0.ddim_step(eps, t, tp, x))
    assert not np.allclose(a1, a0)
    # set_alpha_to_one=False's final alpha is alphas_cumprod[0]
    acp0 = float(s0.alphas_cumprod[0])
    x0_pred = (x - np.sqrt(1 - float(s0.alphas_cumprod[19])) * eps) \
        / np.sqrt(float(s0.alphas_cumprod[19]))
    expect = np.sqrt(acp0) * x0_pred + np.sqrt(1 - acp0) * eps
    np.testing.assert_allclose(a0, expect, rtol=1e-5, atol=1e-6)


def test_ddpm_final_step_ignores_set_alpha_to_one():
    """The DDIM-only set_alpha_to_one knob must not leak into ddpm_step:
    diffusers DDPMScheduler uses alpha_prod_prev = 1.0 unconditionally at
    the prev_t < 0 boundary, so both configs must produce the identical
    final ancestral step."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 4, 8, 2))
    eps = jax.random.normal(jax.random.fold_in(rng, 2), (2, 4, 8, 2))
    t = jnp.zeros((2,), jnp.int32)
    tp = jnp.full((2,), -1, jnp.int32)
    a = Schedule.create(ScheduleConfig(set_alpha_to_one=True))
    b = Schedule.create(ScheduleConfig(set_alpha_to_one=False))
    np.testing.assert_array_equal(
        np.asarray(a.ddpm_step(rng, eps, t, tp, x)),
        np.asarray(b.ddpm_step(rng, eps, t, tp, x)))
    # DDIM keeps honoring the knob (the existing semantics)
    da = np.asarray(a.ddim_step(eps, t, tp, x))
    db = np.asarray(b.ddim_step(eps, t, tp, x))
    assert not np.allclose(da, db)
