"""Diffusion noise schedules and samplers (DDPM / DDIM / PNDM).

The reference uses diffusers schedulers: DDPMScheduler for Stage-1 noising
(compute_z.py:378) and the SD pipeline default PNDM for sampling.  Here the
schedule math is implemented directly as stateless jnp functions: a
``Schedule`` holds the precomputed beta/alpha tables; samplers are pure
``(state, latents, eps) -> (state, latents)`` steps so a full sampling run is
a ``lax.scan`` inside one jit — no per-step python, no host sync.

SD v1.x / SDXL schedule: scaled_linear betas 0.00085→0.012 over 1000 steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Schedule:
    """Precomputed diffusion schedule tables (host numpy; tiny)."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    num_train_timesteps: int
    prediction_type: str = "epsilon"

    @classmethod
    def scaled_linear(cls, beta_start: float = 0.00085, beta_end: float = 0.012,
                      num_train_timesteps: int = 1000,
                      prediction_type: str = "epsilon") -> "Schedule":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps)
            ** 2
        ).astype(np.float64)
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(betas.astype(np.float32),
                   alphas_cumprod.astype(np.float32),
                   num_train_timesteps, prediction_type)

    @classmethod
    def linear(cls, beta_start: float = 0.0001, beta_end: float = 0.02,
               num_train_timesteps: int = 1000) -> "Schedule":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps)
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(betas.astype(np.float32),
                   alphas_cumprod.astype(np.float32), num_train_timesteps)


def sd_schedule() -> Schedule:
    return Schedule.scaled_linear()


def add_noise(schedule: Schedule, x0: jnp.ndarray, noise: jnp.ndarray,
              timesteps: jnp.ndarray) -> jnp.ndarray:
    """Forward process q(x_t | x_0) (DDPM): sqrt(acp)*x0 + sqrt(1-acp)*eps."""
    acp = jnp.asarray(schedule.alphas_cumprod)[timesteps]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    sqrt_acp = jnp.sqrt(acp).reshape(shape)
    sqrt_1macp = jnp.sqrt(1.0 - acp).reshape(shape)
    return sqrt_acp * x0 + sqrt_1macp * noise


def velocity_target(schedule: Schedule, x0: jnp.ndarray, noise: jnp.ndarray,
                    timesteps: jnp.ndarray) -> jnp.ndarray:
    """v-prediction target: sqrt(acp)*eps − sqrt(1−acp)*x0."""
    acp = jnp.asarray(schedule.alphas_cumprod)[timesteps]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return (
        jnp.sqrt(acp).reshape(shape) * noise
        - jnp.sqrt(1.0 - acp).reshape(shape) * x0
    )


def ddim_timesteps(schedule: Schedule, num_inference_steps: int,
                   leading: bool = True) -> np.ndarray:
    """Descending inference timesteps (diffusers 'leading' spacing)."""
    step = schedule.num_train_timesteps // num_inference_steps
    if leading:
        ts = (np.arange(num_inference_steps) * step).round()[::-1] + 1
        ts = np.clip(ts, 0, schedule.num_train_timesteps - 1)
    else:
        ts = np.linspace(0, schedule.num_train_timesteps - 1,
                         num_inference_steps).round()[::-1]
    return ts.astype(np.int32)


def ddim_step(schedule: Schedule, latents: jnp.ndarray, eps: jnp.ndarray,
              t: jnp.ndarray, t_prev: jnp.ndarray,
              eta: float = 0.0) -> jnp.ndarray:
    """One deterministic DDIM update x_t → x_{t_prev} (eta=0)."""
    acp = jnp.asarray(schedule.alphas_cumprod)
    a_t = acp[t]
    # set_alpha_to_one=False (SD scheduler config): final alpha = acp[0]
    a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], acp[0])
    if schedule.prediction_type == "epsilon":
        x0 = (latents - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        eps_pred = eps
    elif schedule.prediction_type == "v_prediction":
        x0 = jnp.sqrt(a_t) * latents - jnp.sqrt(1.0 - a_t) * eps
        eps_pred = jnp.sqrt(a_t) * eps + jnp.sqrt(1.0 - a_t) * latents
    else:
        raise ValueError(schedule.prediction_type)
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps_pred


def ddpm_step(schedule: Schedule, latents: jnp.ndarray, eps: jnp.ndarray,
              t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """One ancestral DDPM update (variance_type='fixed_small')."""
    betas = jnp.asarray(schedule.betas)
    acp = jnp.asarray(schedule.alphas_cumprod)
    beta_t = betas[t]
    a_t = 1.0 - beta_t
    acp_t = acp[t]
    acp_prev = jnp.where(t > 0, acp[jnp.maximum(t - 1, 0)], 1.0)
    x0 = (latents - jnp.sqrt(1.0 - acp_t) * eps) / jnp.sqrt(acp_t)
    x0 = jnp.clip(x0, -1.0, 1.0)
    coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef_xt = jnp.sqrt(a_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    mean = coef_x0 * x0 + coef_xt * latents
    var = beta_t * (1.0 - acp_prev) / (1.0 - acp_t)
    return mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise


def scan_sampler(sampler: str, schedule: Schedule, unet_eps, latents,
                 ts, ts_prev, unet_eps_tail=None, n_head: int = None):
    """Full inference loop for any registered sampler as one ``lax.scan``.

    ``unet_eps(lat, t)`` is the (CFG-merged) noise model; ``ts``/``ts_prev``
    are the descending timestep arrays.  Shared by the SD and SDXL
    pipelines so sampler updates live in exactly one place.

    ``unet_eps_tail``/``n_head`` split the loop at a STATIC step index:
    steps ``[0, n_head)`` use ``unet_eps``, the rest ``unet_eps_tail``,
    with the sampler state (PNDM eps ring / DPM++ history) threaded across
    the boundary — two scans in one program, numerically identical to one
    scan when both noise models agree.  Used for CFG-interval truncation
    (drop the uncond branch for low-noise steps; Kynkäänniemi et al. 2024
    "Applying guidance in a limited interval" — the half-batch tail is the
    compiler-friendly form of the reference's full-length CFG loop,
    compute_z.py:384-418)."""
    ts, ts_prev = jnp.asarray(ts), jnp.asarray(ts_prev)
    ts_eval = ts
    if sampler == "pndm" and ts.shape[0] > 1:
        # diffusers skip-prk PNDM duplicates the SECOND timestep
        # (set_timesteps: [..., t[-2], t[-1]] reversed) and its step 1
        # re-runs the FIRST transition from the saved sample with the
        # averaged eps — so eval-t and transfer-t DIFFER at step 1:
        #   evals:      t0, t1, t1, t2, ...   (N+1 UNet calls)
        #   transfers: (t0→t1), (t0→t1), (t1→t2), ...
        ts_eval = jnp.concatenate([ts[:1], ts[1:2], ts[1:]])
        ts = jnp.concatenate([ts[:1], ts[:1], ts[1:]])
        ts_prev = jnp.concatenate([ts_prev[:1], ts_prev[:1], ts_prev[1:]])
        if n_head is not None:
            # eval j>=1 belongs to original step j-1
            n_head = int(n_head) + 1
    n_steps = ts.shape[0]
    if unet_eps_tail is None or n_head is None or n_head >= n_steps:
        segments = [(unet_eps, ts_eval, ts, ts_prev)]
    else:
        n_head = max(int(n_head), 1)
        segments = [
            (unet_eps, ts_eval[:n_head], ts[:n_head], ts_prev[:n_head]),
            (unet_eps_tail, ts_eval[n_head:], ts[n_head:], ts_prev[n_head:]),
        ]

    if sampler == "ddim":
        lat = latents
        for eps_fn, _seg_eval, seg_ts, seg_prev in segments:

            def body(lat, tp, eps_fn=eps_fn):
                t, t_prev = tp
                return ddim_step(schedule, lat, eps_fn(lat, t), t,
                                 t_prev), None

            lat, _ = jax.lax.scan(body, lat, (seg_ts, seg_prev))
        return lat
    if sampler == "pndm":
        init, step = pndm_init(latents.shape, latents.dtype), pndm_step
    elif sampler == "dpm++":
        init, step = dpmpp_init(latents.shape, latents.dtype), dpmpp_step
    else:
        raise ValueError(f"unknown sampler {sampler!r}")

    carry = (latents, init)
    for eps_fn, seg_eval, seg_ts, seg_prev in segments:

        def body(carry, tp, eps_fn=eps_fn):
            lat, st = carry
            t_eval, t, t_prev = tp
            st, lat = step(schedule, st, lat, eps_fn(lat, t_eval), t,
                           t_prev)
            return (lat, st), None

        carry, _ = jax.lax.scan(body, carry, (seg_eval, seg_ts, seg_prev))
    return carry[0]


class PNDMState(NamedTuple):
    """Rolling eps history for the PNDM linear multistep region, plus the
    pre-first-transition sample for the Heun warm-up re-do."""

    ets: jnp.ndarray  # (4, *latent_shape) ring buffer of eps predictions
    counter: jnp.ndarray  # int32 number of steps taken
    cur_sample: jnp.ndarray  # latent saved at step 0, consumed at step 1


def pndm_init(latent_shape, dtype=jnp.float32) -> PNDMState:
    return PNDMState(
        ets=jnp.zeros((4,) + tuple(latent_shape), dtype=dtype),
        counter=jnp.zeros((), dtype=jnp.int32),
        cur_sample=jnp.zeros(tuple(latent_shape), dtype=dtype),
    )


class DPMState(NamedTuple):
    """DPM-Solver++ 2M multistep history."""

    prev_x0: jnp.ndarray  # x0 prediction at the previous step
    prev_lambda: jnp.ndarray  # λ of the previous step (scalar f32)
    counter: jnp.ndarray  # int32 steps taken


def dpmpp_init(latent_shape, dtype=jnp.float32) -> DPMState:
    return DPMState(
        prev_x0=jnp.zeros(tuple(latent_shape), dtype=dtype),
        prev_lambda=jnp.zeros((), jnp.float32),
        counter=jnp.zeros((), jnp.int32),
    )


def dpmpp_step(schedule: Schedule, state: DPMState, latents: jnp.ndarray,
               eps: jnp.ndarray, t: jnp.ndarray, t_prev: jnp.ndarray
               ) -> Tuple[DPMState, jnp.ndarray]:
    """DPM-Solver++(2M) update x_t → x_{t_prev} (data-prediction multistep,
    deterministic; the diffusers ``DPMSolverMultistepScheduler`` with
    ``algorithm_type='dpmsolver++', solver_order=2``).

    Roughly PNDM-50 quality at 20-25 steps — an eval-time option the
    reference (pinned to the SD pipeline's PNDM default) never had.  First
    step and the final step use the 1st-order update (``lower_order_final``),
    so the whole sampler is a branchless ``lax.scan``.
    """
    acp = jnp.asarray(schedule.alphas_cumprod)
    acp_t = acp[t]
    acp_p = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
    a_t, s_t = jnp.sqrt(acp_t), jnp.sqrt(1.0 - acp_t)
    a_p = jnp.sqrt(acp_p)
    s_p = jnp.sqrt(jnp.maximum(1.0 - acp_p, 1e-20))  # final step: σ→0

    if schedule.prediction_type == "epsilon":
        x0 = (latents - s_t * eps) / a_t
    elif schedule.prediction_type == "v_prediction":
        x0 = a_t * latents - s_t * eps
    else:
        raise ValueError(schedule.prediction_type)

    lam_t = jnp.log(a_t) - jnp.log(s_t)
    lam_p = jnp.log(a_p) - jnp.log(s_p)
    h = lam_p - lam_t  # > 0 (noise decreases)
    em1 = jnp.exp(-h) - 1.0
    ratio = s_p / s_t

    first = ratio * latents - a_p * em1 * x0
    h_prev = lam_t - state.prev_lambda
    r0 = h_prev / jnp.maximum(h, 1e-12)
    d1 = (x0 - state.prev_x0) / jnp.maximum(r0, 1e-12)
    second = ratio * latents - a_p * em1 * (x0 + 0.5 * d1)

    use_second = (state.counter > 0) & (t_prev >= 0)
    prev = jnp.where(use_second, second, first)
    return DPMState(prev_x0=x0, prev_lambda=lam_t,
                    counter=state.counter + 1), prev


def pndm_step(schedule: Schedule, state: PNDMState, latents: jnp.ndarray,
              eps: jnp.ndarray, t: jnp.ndarray, t_prev: jnp.ndarray
              ) -> Tuple[PNDMState, jnp.ndarray]:
    """PNDM skip-prk step, exactly diffusers' ``step_plms`` counter
    machinery: step 0 is plain DDIM (sample saved as cur_sample, eps
    recorded); step 1 re-runs the FIRST transition from cur_sample with
    the two eps averaged (a Heun corrector — the caller's timestep arrays
    duplicate the second timestep, scan_sampler builds them); steps 2+
    are 2nd/3rd/4th-order Adams–Bashforth on the eps history (the step-1
    eps is NOT recorded, matching ``if self.counter != 1: ets.append``).
    Branchless lax.switch on the warm-up counter so the whole sampler
    scans."""
    c = state.counter
    ets_next = jnp.concatenate([state.ets[1:], eps[None]], axis=0)
    # diffusers: the Heun step's eps never enters the history
    ets = jnp.where(c == 1, state.ets, ets_next)

    def order1(_):
        return eps

    def heun(_):
        # (eps(x1, t1) + eps(x0, t0)) / 2, applied from the SAVED x0
        return (eps + state.ets[3]) / 2

    def order2(_):
        return (3 * ets[3] - ets[2]) / 2

    def order3(_):
        return (23 * ets[3] - 16 * ets[2] + 5 * ets[1]) / 12

    def order4(_):
        return (55 * ets[3] - 59 * ets[2] + 37 * ets[1] - 9 * ets[0]) / 24

    eps_avg = jax.lax.switch(jnp.minimum(c, 4),
                             [order1, heun, order2, order3, order4], None)
    sample = jnp.where(c == 1, state.cur_sample, latents)
    cur_sample = jnp.where(c == 0, latents, state.cur_sample)

    acp = jnp.asarray(schedule.alphas_cumprod)
    a_t = acp[t]
    # set_alpha_to_one=False (SD scheduler config): the final transition
    # targets alphas_cumprod[0], not 1.0
    a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], acp[0])
    # diffusers PNDM transfer formula (equivalent to DDIM with eps_avg)
    x0 = (sample - jnp.sqrt(1.0 - a_t) * eps_avg) / jnp.sqrt(a_t)
    prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps_avg
    return PNDMState(ets=ets, counter=c + 1, cur_sample=cur_sample), prev
