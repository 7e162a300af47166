"""Diffusion schedulers as pure, jit-stable functions.

The reference drives every strategy and the Proof-of-Inference layer through
``diffusers.DDIMScheduler`` (`/root/reference/InferNet/neurons/miner.py:522-589`,
`/root/reference/InferNet/template/validator/proof.py:307-392`).  Its exact
``alphas_cumprod`` extraction per sampled timestep (`miner.py:534-546`) is the
determinism anchor for spot-check verification, so here the entire schedule is a
small set of precomputed tables + a pure ``ddim_step`` that can live inside
``lax.scan``: same inputs -> bitwise-identical outputs on TPU.

No classes with mutable ``step_index`` state (the reference's scheduler carries
hidden state; that is hostile to XLA tracing and to verification).  Everything is
explicit: ``DDIMSchedule`` is a frozen pytree of f32 tables.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Precomputed DDIM tables for a fixed (num_train_timesteps, num_steps).

    Fields are jnp.float32 / int32 arrays so the whole object is a pytree leaf
    collection and can be closed over or passed through jit boundaries.

    timesteps:        (N,) int32, descending training-timestep indices.
    alphas_cumprod:   (N,) f32, alpha-bar at each sampled timestep.
    alphas_cumprod_prev: (N,) f32, alpha-bar at the *previous* (next-visited)
                      timestep; the final entry uses alpha-bar[0]
                      (diffusers' ``set_alpha_to_one=False`` behaviour, which is
                      what Zeroscope ships).
    """

    timesteps: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    # 'epsilon' (Zeroscope/SD UNets) or 'v_prediction' (CogVideoX-class DiTs)
    prediction_type: str = dataclasses.field(default="epsilon",
                                             metadata={"static": True})

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def make_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> np.ndarray:
    """Training beta schedule (host-side, float64 for accuracy then f32)."""
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"unknown beta_schedule {beta_schedule!r}")
    return betas


def make_ddim_schedule(
    num_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    steps_offset: int = 1,
    timestep_spacing: str = "leading",
    prediction_type: str = "epsilon",
) -> DDIMSchedule:
    """Build the sampled-timestep tables.

    Matches diffusers' DDIMScheduler.set_timesteps 'leading' spacing with
    steps_offset=1 (the Zeroscope config), cf. the per-step alpha extraction at
    reference `neurons/miner.py:534-546`.
    """
    betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    acp = np.cumprod(1.0 - betas)

    if timestep_spacing == "leading":
        step_ratio = num_train_timesteps // num_steps
        ts = (np.arange(num_steps) * step_ratio).round().astype(np.int64)[::-1].copy()
        ts += steps_offset
    elif timestep_spacing == "trailing":
        step_ratio = num_train_timesteps / num_steps
        ts = np.round(np.arange(num_train_timesteps, 0, -step_ratio)).astype(np.int64) - 1
    else:
        raise ValueError(f"unknown timestep_spacing {timestep_spacing!r}")
    ts = np.clip(ts, 0, num_train_timesteps - 1)

    prev_ts = ts - num_train_timesteps // num_steps
    alpha_t = acp[ts]
    # set_alpha_to_one=False -> final alpha_prev is alphas_cumprod[0]
    alpha_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, None)], acp[0])

    # host numpy, NOT device arrays: schedule tables are closed over by jitted
    # programs as constants; a committed device array forces a device->host
    # fetch during LOWERING, which fails when HBM is under pressure (the
    # round-2 bench RESOURCE_EXHAUSTED at bench.py:105). numpy constants lower
    # without touching the device and carry identical f32 values.
    return DDIMSchedule(
        timesteps=np.asarray(ts, dtype=np.int32),
        alphas_cumprod=np.asarray(alpha_t, dtype=np.float32),
        alphas_cumprod_prev=np.asarray(alpha_prev, dtype=np.float32),
        prediction_type=prediction_type,
    )


def ddim_step(
    sched: DDIMSchedule,
    step_index: jnp.ndarray,
    latents: jnp.ndarray,
    eps: jnp.ndarray,
    eta: float = 0.0,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One deterministic DDIM update z_t -> z_{t_prev}.

    Pure function of (tables, step_index, z, eps); jit/scan friendly. All math
    in f32 regardless of latent dtype, result cast back — this pins the bit
    pattern the Proof-of-Inference layer commits to.

    eta > 0 adds the stochastic DDIM term and requires `noise`.
    """
    orig_dtype = latents.dtype
    z = latents.astype(jnp.float32)
    model_out = eps.astype(jnp.float32)

    alpha_t = jnp.asarray(sched.alphas_cumprod)[step_index]
    alpha_prev = jnp.asarray(sched.alphas_cumprod_prev)[step_index]
    beta_t = 1.0 - alpha_t

    if sched.prediction_type == "v_prediction":
        # v = sqrt(a) eps - sqrt(1-a) x0  =>  x0 = sqrt(a) z - sqrt(1-a) v
        pred_x0 = jnp.sqrt(alpha_t) * z - jnp.sqrt(beta_t) * model_out
        e = jnp.sqrt(alpha_t) * model_out + jnp.sqrt(beta_t) * z
    else:
        e = model_out
        pred_x0 = (z - jnp.sqrt(beta_t) * e) * jax.lax.rsqrt(alpha_t)

    if eta > 0.0:
        if noise is None:
            raise ValueError("eta > 0 requires noise")
        variance = (1.0 - alpha_prev) / (1.0 - alpha_t) * (1.0 - alpha_t / alpha_prev)
        sigma = eta * jnp.sqrt(variance)
    else:
        sigma = jnp.float32(0.0)

    dir_xt = jnp.sqrt(1.0 - alpha_prev - sigma**2) * e
    prev = jnp.sqrt(alpha_prev) * pred_x0 + dir_xt
    if eta > 0.0:
        prev = prev + sigma * noise.astype(jnp.float32)
    return prev.astype(orig_dtype)


def ddim_step_from_timestep(
    sched: DDIMSchedule, t: jnp.ndarray, latents: jnp.ndarray, eps: jnp.ndarray
) -> jnp.ndarray:
    """DDIM step addressed by raw training timestep t instead of step index.

    The validator's temporal-coherence spot check re-derives z_{t+1} from
    (z_t, eps_t) given only the committed timesteps (reference
    `proof.py:419-627`); it never knows the loop index, so we look it up.
    """
    step_index = jnp.argmax(jnp.asarray(sched.timesteps) == t)
    return ddim_step(sched, step_index, latents, eps)


def init_noise_sigma() -> float:
    """DDIM initial latent scale (identity; kept for API parity)."""
    return 1.0


# --- DPM-Solver++(2M): faster sampler the reference lacks; same table style ---


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DPMSchedule:
    timesteps: jnp.ndarray          # (N,) int32
    alphas_cumprod: jnp.ndarray     # (N,) f32 alpha-bar at sampled steps
    lambdas: jnp.ndarray            # (N,) f32 log-SNR/2
    sigmas: jnp.ndarray             # (N,) f32
    alphas: jnp.ndarray             # (N,) f32 sqrt(alpha-bar)

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def make_dpm_schedule(
    num_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
) -> DPMSchedule:
    betas = make_betas(num_train_timesteps, beta_start, beta_end)
    acp = np.cumprod(1.0 - betas)
    step_ratio = num_train_timesteps // num_steps
    ts = (np.arange(num_steps) * step_ratio).round().astype(np.int64)[::-1].copy() + 1
    ts = np.clip(ts, 0, num_train_timesteps - 1)
    a = np.sqrt(acp[ts])
    s = np.sqrt(1.0 - acp[ts])
    lam = np.log(a) - np.log(s)
    # host numpy for the same lowering-safety reason as make_ddim_schedule
    return DPMSchedule(
        timesteps=np.asarray(ts, np.int32),
        alphas_cumprod=np.asarray(acp[ts], np.float32),
        lambdas=np.asarray(lam, np.float32),
        sigmas=np.asarray(s, np.float32),
        alphas=np.asarray(a, np.float32),
    )


def dpm_step(
    sched: DPMSchedule,
    step_index: jnp.ndarray,
    latents: jnp.ndarray,
    eps: jnp.ndarray,
    prev_x0: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DPM-Solver++(2M) multistep update. Returns (z_prev, x0) where x0 must be
    fed back as `prev_x0` on the next call (first call: pass current x0 -> 1st
    order). Deterministic, scan-friendly."""
    orig_dtype = latents.dtype
    z = latents.astype(jnp.float32)
    e = eps.astype(jnp.float32)
    n = sched.num_steps

    alphas = jnp.asarray(sched.alphas)
    sigmas = jnp.asarray(sched.sigmas)
    lambdas = jnp.asarray(sched.lambdas)
    a_t = alphas[step_index]
    s_t = sigmas[step_index]
    l_t = lambdas[step_index]
    nxt = jnp.minimum(step_index + 1, n - 1)
    a_n = alphas[nxt]
    s_n = sigmas[nxt]
    l_n = lambdas[nxt]

    x0 = (z - s_t * e) / a_t

    h = l_n - l_t
    l_p = lambdas[jnp.maximum(step_index - 1, 0)]
    h_last = l_t - l_p
    r = h_last / jnp.where(h == 0, 1.0, h)
    # 2nd-order correction; degrades to 1st order when prev_x0 == x0
    d = (1.0 + 1.0 / (2.0 * jnp.where(r == 0, 1.0, r))) * x0 - (
        1.0 / (2.0 * jnp.where(r == 0, 1.0, r))
    ) * prev_x0
    use_first_order = step_index == 0
    d = jnp.where(use_first_order, x0, d)

    z_prev = (s_n / s_t) * z - a_n * jnp.expm1(-h) * d
    # final step: return clean x0 estimate
    z_prev = jnp.where(step_index == n - 1, x0, z_prev)
    return z_prev.astype(orig_dtype), x0
