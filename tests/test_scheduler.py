"""Golden-value tests for the DDIM schedule tables and step function.

The golden alphas_cumprod values were computed independently (float64 numpy)
from the Zeroscope scheduler config (beta 0.00085->0.012, scaled_linear, 1000
train steps) — the config the reference extracts per-step at
/root/reference/InferNet/neurons/miner.py:534-546.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdx_tpu.ops.scheduler import (
    DDIMSchedule,
    ddim_step,
    ddim_step_from_timestep,
    make_ddim_schedule,
    make_dpm_schedule,
    dpm_step,
)


def _reference_acp():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    return np.cumprod(1 - betas)


def test_timesteps_leading_spacing():
    sched = make_ddim_schedule(num_steps=25)
    ts = np.asarray(sched.timesteps)
    # leading spacing: arange(25)*40 reversed, +1 offset
    expected = (np.arange(25) * 40)[::-1] + 1
    np.testing.assert_array_equal(ts, expected)
    assert ts[0] == 961 and ts[-1] == 1


def test_alphas_cumprod_golden():
    sched = make_ddim_schedule(num_steps=10)
    acp = _reference_acp()
    ts = np.asarray(sched.timesteps)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp[ts], rtol=1e-6)
    # previous-step alphas: last entry falls back to acp[0] (set_alpha_to_one=False)
    prev = ts - 100
    expected_prev = np.where(prev >= 0, acp[np.clip(prev, 0, None)], acp[0])
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod_prev), expected_prev, rtol=1e-6)


def test_ddim_step_matches_closed_form():
    sched = make_ddim_schedule(num_steps=10)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 2, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 2, 4, 4, 4)).astype(np.float32)
    i = 3
    out = ddim_step(sched, jnp.asarray(i), jnp.asarray(z), jnp.asarray(eps))
    a_t = float(sched.alphas_cumprod[i])
    a_p = float(sched.alphas_cumprod_prev[i])
    x0 = (z - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expected = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5, atol=2e-5)


def test_ddim_step_deterministic_and_scan_stable():
    sched = make_ddim_schedule(num_steps=5)
    z = jnp.ones((1, 2, 4, 4, 4), jnp.float32)
    eps = jnp.full((1, 2, 4, 4, 4), 0.1, jnp.float32)

    @jax.jit
    def run(z):
        def body(z, i):
            return ddim_step(sched, i, z, eps), None
        out, _ = jax.lax.scan(body, z, jnp.arange(sched.num_steps))
        return out

    a = run(z)
    b = run(z)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(a)))


def test_ddim_step_from_timestep_matches_index():
    sched = make_ddim_schedule(num_steps=8)
    z = jnp.ones((1, 1, 2, 2, 4), jnp.float32)
    eps = jnp.full_like(z, 0.3)
    for i in [0, 3, 7]:
        t = sched.timesteps[i]
        by_t = ddim_step_from_timestep(sched, t, z, eps)
        by_i = ddim_step(sched, jnp.asarray(i), z, eps)
        np.testing.assert_array_equal(np.asarray(by_t), np.asarray(by_i))


def test_dpm_schedule_runs_and_is_finite():
    sched = make_dpm_schedule(num_steps=8)
    z = jnp.ones((1, 2, 4, 4, 4), jnp.float32)

    def body(carry, i):
        z, x0 = carry
        eps = 0.1 * z
        z2, x0n = dpm_step(sched, i, z, eps, x0)
        return (z2, x0n), None

    (zf, _), _ = jax.lax.scan(body, (z, jnp.zeros_like(z)), jnp.arange(8))
    assert np.all(np.isfinite(np.asarray(zf)))
