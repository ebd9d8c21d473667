"""DDPM (training) and DDIM (sampling) noise schedulers.

Functional JAX re-design of the schedulers the reference pulls from
diffusers (DDIM at src/inference.py:123, DDPM at
src/train_vto.py:243-247).  All state is precomputed arrays on a frozen
dataclass; ``step`` is pure and shape-static so the whole 50-step sample
loop compiles into one XLA program (``lax.scan`` in pipelines.tryon).

SD-2 config: scaled_linear betas 0.00085 -> 0.012 over 1000 steps,
epsilon prediction, steps_offset=1, no clip_sample,
set_alpha_to_one=False.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"  # 'epsilon' | 'v_prediction'
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    clip_sample: bool = False


def _make_alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                cfg.beta_start ** 0.5,
                cfg.beta_end ** 0.5,
                cfg.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end,
                            cfg.num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"unknown beta schedule {cfg.beta_schedule!r}")
    return np.cumprod(1.0 - betas).astype(np.float32)


class DDPMScheduler:
    """Forward (noising) process + ancestral step; used for training."""

    def __init__(self, config: SchedulerConfig = SchedulerConfig()):
        self.config = config
        self.alphas_cumprod = jnp.asarray(_make_alphas_cumprod(config))

    def add_noise(self, sample: jax.Array, noise: jax.Array,
                  timesteps: jax.Array) -> jax.Array:
        """q(x_t | x_0): sqrt(a_t) x0 + sqrt(1-a_t) eps."""
        a = self.alphas_cumprod[timesteps].astype(sample.dtype)
        while a.ndim < sample.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * sample + jnp.sqrt(1.0 - a) * noise

    def get_velocity(self, sample: jax.Array, noise: jax.Array,
                     timesteps: jax.Array) -> jax.Array:
        """v-prediction target: sqrt(a) eps - sqrt(1-a) x0."""
        a = self.alphas_cumprod[timesteps].astype(sample.dtype)
        while a.ndim < sample.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * sample


class DDIMScheduler:
    """Deterministic DDIM sampler with a static timestep plan.

    ``set_timesteps(n)`` precomputes the integer timestep vector (same
    spacing rule as diffusers: stride = T // n, +steps_offset); ``step``
    is pure so it can live inside ``lax.scan``.
    """

    def __init__(self, config: SchedulerConfig = SchedulerConfig()):
        self.config = config
        self.alphas_cumprod = jnp.asarray(_make_alphas_cumprod(config))
        self.final_alpha_cumprod = (
            jnp.asarray(1.0, jnp.float32)
            if config.set_alpha_to_one
            else self.alphas_cumprod[0]
        )
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps: int) -> jax.Array:
        T = self.config.num_train_timesteps
        step_ratio = T // num_inference_steps
        timesteps = (
            (np.arange(num_inference_steps) * step_ratio)
            .round()[::-1]
            .copy()
            .astype(np.int64)
        )
        timesteps += self.config.steps_offset
        self.num_inference_steps = num_inference_steps
        return jnp.asarray(timesteps)

    def scale_model_input(self, sample: jax.Array, t: jax.Array) -> jax.Array:
        return sample  # DDIM does not scale

    # ---- uniform loop protocol (shared by DDIM/PNDM/LMS so the try-on
    # pipeline's scan can carry any scheduler's state; reference
    # tryon_pipe.py accepts the DDIM|PNDM|LMS union) ----

    def init_loop_state(self, latents: jax.Array):
        return ()

    def scale_input(self, sample: jax.Array, step_index: jax.Array,
                    t: jax.Array) -> jax.Array:
        return sample

    def loop_step(self, state, model_output, step_index, t, sample):
        return (), self.step(model_output, t, sample)

    def step(
        self,
        model_output: jax.Array,
        timestep: jax.Array,
        sample: jax.Array,
        *,
        eta: float = 0.0,
        noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """One x_t -> x_{t-stride} update (epsilon or v parametrization)."""
        cfg = self.config
        stride = cfg.num_train_timesteps // self.num_inference_steps
        prev_timestep = timestep - stride

        a_t = self.alphas_cumprod[timestep].astype(jnp.float32)
        a_prev = jnp.where(
            prev_timestep >= 0,
            self.alphas_cumprod[jnp.maximum(prev_timestep, 0)],
            self.final_alpha_cumprod,
        ).astype(jnp.float32)
        beta_t = 1.0 - a_t

        sample_f = sample.astype(jnp.float32)
        out_f = model_output.astype(jnp.float32)

        if cfg.prediction_type == "epsilon":
            x0 = (sample_f - jnp.sqrt(beta_t) * out_f) / jnp.sqrt(a_t)
            eps = out_f
        elif cfg.prediction_type == "v_prediction":
            x0 = jnp.sqrt(a_t) * sample_f - jnp.sqrt(beta_t) * out_f
            eps = jnp.sqrt(a_t) * out_f + jnp.sqrt(beta_t) * sample_f
        else:
            raise ValueError(cfg.prediction_type)

        if cfg.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)

        if eta > 0.0:
            variance = (beta_t / (1.0 - a_prev)) * (1.0 - a_prev / a_t)
            sigma = eta * jnp.sqrt(
                jnp.clip((1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev),
                         0.0)
            )
        else:
            sigma = jnp.asarray(0.0, jnp.float32)

        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0)) * eps
        prev = jnp.sqrt(a_prev) * x0 + dir_xt
        if eta > 0.0 and noise is not None:
            prev = prev + sigma * noise.astype(jnp.float32)
        return prev.astype(sample.dtype)


class PNDMScheduler:
    """PLMS sampler (PNDM with skip_prk_steps, the SD configuration).

    The reference pipeline's scheduler union includes PNDM alongside
    DDIM/LMS (reference tryon_pipe.py scheduler type hints); DDIM is
    what the CLIs instantiate, PNDM is provided for surface parity.
    Functional state (epsilon history + counter) is carried explicitly
    so the loop scans/jits; ``make_step`` returns (init_state, step_fn).
    """

    def __init__(self, config: SchedulerConfig = SchedulerConfig()):
        self.config = config
        self.alphas_cumprod = jnp.asarray(_make_alphas_cumprod(config))
        self.final_alpha_cumprod = (
            jnp.asarray(1.0, jnp.float32)
            if config.set_alpha_to_one
            else self.alphas_cumprod[0]
        )
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps: int) -> jax.Array:
        """PLMS plan: standard spacing with the second step repeated
        (diffusers' skip-prk timestep duplication) — UNet runs n+1x."""
        T = self.config.num_train_timesteps
        ratio = T // num_inference_steps
        base = (np.arange(num_inference_steps) * ratio).round().astype(
            np.int64) + self.config.steps_offset
        base = base[::-1].copy()
        plan = np.concatenate([base[:1], base[1:2], base[1:]])
        self.num_inference_steps = num_inference_steps
        return jnp.asarray(plan)

    def scale_model_input(self, sample, t):
        return sample

    def _prev_sample(self, sample, timestep, prev_timestep, eps):
        a_t = jnp.where(timestep >= 0,
                        self.alphas_cumprod[jnp.maximum(timestep, 0)],
                        self.final_alpha_cumprod).astype(jnp.float32)
        a_prev = jnp.where(prev_timestep >= 0,
                           self.alphas_cumprod[
                               jnp.maximum(prev_timestep, 0)],
                           self.final_alpha_cumprod).astype(jnp.float32)
        b_t = 1.0 - a_t
        b_prev = 1.0 - a_prev
        coef = (a_prev - a_t) / (
            jnp.sqrt(a_t) * (jnp.sqrt(a_prev * b_t)
                             + jnp.sqrt(a_t * b_prev)))
        return (jnp.sqrt(a_prev / a_t) * sample.astype(jnp.float32)
                - coef * eps.astype(jnp.float32)).astype(sample.dtype)

    def init_state(self, latents_shape, dtype=jnp.float32):
        return {
            "ets": jnp.zeros((4,) + tuple(latents_shape), jnp.float32),
            "ets_count": jnp.zeros((), jnp.int32),
            "cur_sample": jnp.zeros(latents_shape, dtype),
            "counter": jnp.zeros((), jnp.int32),
        }

    def step(self, state, model_output, timestep, sample):
        """One PLMS update; returns (state, prev_sample)."""
        stride = (self.config.num_train_timesteps
                  // self.num_inference_steps)
        counter = state["counter"]
        is_second = counter == 1
        eps = model_output.astype(jnp.float32)

        # history update (skipped on the duplicated second call)
        ets = jnp.where(is_second, state["ets"],
                        jnp.concatenate([state["ets"][1:], eps[None]]))
        ets_count = jnp.where(is_second, state["ets_count"],
                              jnp.minimum(state["ets_count"] + 1, 4))

        prev_t = jnp.where(is_second, timestep,
                           timestep - stride)
        t_eff = jnp.where(is_second, timestep + stride, timestep)

        e1, e2, e3, e4 = ets[3], ets[2], ets[1], ets[0]
        blended = jnp.select(
            [jnp.logical_and(ets_count == 1, counter == 0),
             jnp.logical_and(ets_count == 1, is_second),
             ets_count == 2,
             ets_count == 3],
            [eps,
             (eps + e1) / 2.0,
             (3 * e1 - e2) / 2.0,
             (23 * e1 - 16 * e2 + 5 * e3) / 12.0],
            (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24.0)

        cur_sample = jnp.where(counter == 0, sample,
                               state["cur_sample"]).astype(sample.dtype)
        base = jnp.where(is_second, cur_sample, sample)
        prev = self._prev_sample(base, t_eff, prev_t, blended)
        new_state = {
            "ets": ets,
            "ets_count": ets_count,
            "cur_sample": cur_sample,
            "counter": counter + 1,
        }
        return new_state, prev

    # ---- uniform loop protocol ----

    def init_loop_state(self, latents: jax.Array):
        return self.init_state(latents.shape, latents.dtype)

    def scale_input(self, sample, step_index, t):
        return sample

    def loop_step(self, state, model_output, step_index, t, sample):
        return self.step(state, model_output, t, sample)


def make_scheduler(name: str, config: SchedulerConfig = SchedulerConfig()):
    """Build a sampler by CLI name.

    The reference pipeline accepts the DDIM | PNDM | LMS union
    (reference tryon_pipe.py scheduler type hints; the CLIs instantiate
    DDIM, src/inference.py:123).  ``dpm`` is the beyond-reference
    DPM-Solver++(2M) option (~DDIM-50 quality at 20 steps).
    """
    table = {
        "ddim": DDIMScheduler,
        "pndm": PNDMScheduler,
        "lms": LMSDiscreteScheduler,
        "dpm": DPMSolverMultistepScheduler,
    }
    if name not in table:
        raise ValueError(
            f"unknown scheduler {name!r}; choose from {sorted(table)}")
    return table[name](config)


class DPMSolverMultistepScheduler:
    """DPM-Solver++(2M): second-order multistep sampler (beyond-reference).

    The reference ships only the DDIM|PNDM|LMS union (tryon_pipe.py type
    hints); DPM-Solver++ (Lu et al. 2022, arXiv:2211.01095) reaches
    DDIM-50 quality in ~20 steps, i.e. ~2.4x effective throughput on the
    same hardware.  Semantics follow the public diffusers
    DPMSolverMultistepScheduler defaults (algorithm_type="dpmsolver++",
    solver_order=2, solver_type="midpoint", timestep_spacing="linspace",
    final_sigmas_type="zero", lower_order_final=True) so converted
    checkpoints sample identically to the torch ecosystem.

    TPU-first design: the timestep plan is static per ``set_timesteps``,
    so every update coefficient (sigma ratio, first- and second-order
    exponential terms, per-step effective order) is precomputed on host
    in float64; the device step is three fused multiply-adds over the
    latents plus one carried x0-history buffer — scan/jit friendly via
    the same uniform loop protocol as DDIM/PNDM/LMS.
    """

    def __init__(self, config: SchedulerConfig = SchedulerConfig()):
        self.config = config
        acp = _make_alphas_cumprod(config).astype(np.float64)
        # karras-convention sigma grid over train timesteps: s = sqrt((1-a)/a)
        self._sigmas_all = np.sqrt((1.0 - acp) / acp)
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps: int) -> jax.Array:
        T = self.config.num_train_timesteps
        # diffusers "linspace" spacing for DPM-Solver: n+1 points over
        # [0, T-1], rounded, descending, first n kept
        ts = (
            np.linspace(0, T - 1, num_inference_steps + 1)
            .round()[::-1][:-1]
            .astype(np.int64)
            .copy()
        )
        s = np.interp(ts.astype(np.float64),
                      np.arange(len(self._sigmas_all)), self._sigmas_all)
        s = np.concatenate([s, [0.0]])  # final_sigmas_type="zero"

        # VP-space alpha/sigma and log-SNR half lambda from karras sigma:
        # alpha = 1/sqrt(1+s^2), sigma = s*alpha, lambda = -log(s)
        with np.errstate(divide="ignore"):
            lam = -np.log(s)  # +inf at the appended 0 — handled by limits
        alpha = 1.0 / np.sqrt(1.0 + s * s)
        sigma = s * alpha

        n = num_inference_steps
        c_skip = np.zeros(n)
        c_d0 = np.zeros(n)
        c_d1 = np.zeros(n)
        h = lam[1:] - lam[:-1]  # h_i = lambda_{i+1} - lambda_i > 0
        for i in range(n):
            final = s[i + 1] == 0.0
            # limits as h -> inf: exp(-h) -> 0, sigma ratio -> 0
            exp_neg_h = 0.0 if final else np.exp(-h[i])
            c_skip[i] = 0.0 if final else sigma[i + 1] / sigma[i]
            c_d0[i] = -alpha[i + 1] * (exp_neg_h - 1.0)
            # per-step effective order: first-order at step 0 (no
            # history) and at the final zero-sigma step (diffusers
            # lower_order_final / euler-at-final behavior)
            if i == 0 or final:
                c_d1[i] = 0.0
            else:
                r = h[i - 1] / h[i]
                c_d1[i] = 0.5 * c_d0[i] / r  # midpoint: D1 = (m0-m1)/r
        self.num_inference_steps = n
        self._c_skip = jnp.asarray(c_skip, jnp.float32)
        self._c_d0 = jnp.asarray(c_d0, jnp.float32)
        self._c_d1 = jnp.asarray(c_d1, jnp.float32)
        self._alpha_j = jnp.asarray(alpha, jnp.float32)
        self._sigma_j = jnp.asarray(sigma, jnp.float32)
        return jnp.asarray(ts)

    def scale_model_input(self, sample, t):
        return sample  # VP-space sampler: identity, like DDIM

    def step(self, prev_x0, model_output, step_index, sample):
        """(x0-history, eps, i, x_i) -> (new history, x_{i+1})."""
        a_t = self._alpha_j[step_index]
        s_t = self._sigma_j[step_index]
        x = sample.astype(jnp.float32)
        eps = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            x0 = (x - s_t * eps) / a_t
        elif self.config.prediction_type == "v_prediction":
            x0 = a_t * x - s_t * eps
        else:
            raise ValueError(self.config.prediction_type)
        if self.config.clip_sample:
            # same x0 clamp DDIMScheduler.step applies, so a config with
            # clip_sample=True behaves consistently across schedulers
            x0 = jnp.clip(x0, -1.0, 1.0)
        d1 = x0 - prev_x0  # c_d1 is zeroed where the order is 1
        prev = (self._c_skip[step_index] * x
                + self._c_d0[step_index] * x0
                + self._c_d1[step_index] * d1)
        return x0, prev.astype(sample.dtype)

    # ---- uniform loop protocol ----

    def init_loop_state(self, latents: jax.Array):
        return jnp.zeros(latents.shape, jnp.float32)

    def scale_input(self, sample, step_index, t):
        return sample

    def loop_step(self, state, model_output, step_index, t, sample):
        return self.step(state, model_output, step_index, sample)


class LMSDiscreteScheduler:
    """Linear multistep (k-LMS) sampler in sigma space.

    Completes the reference pipeline's scheduler union
    (DDIM | PNDM | LMS, reference tryon_pipe.py imports).  Timesteps are
    static per plan, so the LMS integration coefficients are precomputed
    on host at ``set_timesteps`` — the device step is a pure linear
    combination of the epsilon history (scan/jit friendly).
    """

    def __init__(self, config: SchedulerConfig = SchedulerConfig(),
                 order: int = 4):
        self.config = config
        self.order = order
        acp = _make_alphas_cumprod(config).astype(np.float64)
        self._sigmas_all = np.sqrt((1 - acp) / acp)
        # plan-independent: the linspace plan always starts at t = T-1,
        # so sigma_max (and hence the N(0,1)->x_T scale) is fixed
        self.init_noise_sigma = float(
            np.sqrt(self._sigmas_all[-1] ** 2 + 1))

    def set_timesteps(self, num_inference_steps: int) -> jax.Array:
        T = self.config.num_train_timesteps
        # diffusers LMS spacing: linspace over [0, T-1], descending
        ts = np.linspace(0, T - 1, num_inference_steps,
                         dtype=np.float64)[::-1].copy()
        low = np.floor(ts).astype(int)
        high = np.ceil(ts).astype(int)
        frac = ts - low
        sigmas = ((1 - frac) * self._sigmas_all[low]
                  + frac * self._sigmas_all[high])
        self.sigmas = np.concatenate([sigmas, [0.0]])
        self.num_inference_steps = num_inference_steps
        self.init_noise_sigma = float(np.sqrt(sigmas[0] ** 2 + 1))
        # precompute LMS coefficients for every (step, history) pair
        coeffs = np.zeros((num_inference_steps, self.order))
        for step in range(num_inference_steps):
            order = min(step + 1, self.order)
            for j in range(order):
                coeffs[step, j] = self._lms_coeff(step, j, order)
        self._coeffs = jnp.asarray(coeffs, jnp.float32)
        self._sigmas_j = jnp.asarray(self.sigmas, jnp.float32)
        return jnp.asarray(np.round(ts).astype(np.int64))

    def _lms_coeff(self, t: int, j: int, order: int) -> float:
        import scipy.integrate

        sig = self.sigmas

        def fn(tau):
            prod = 1.0
            for k in range(order):
                if k == j:
                    continue
                prod *= (tau - sig[t - k]) / (sig[t - j] - sig[t - k])
            return prod

        return scipy.integrate.quad(fn, sig[t], sig[t + 1],
                                    epsrel=1e-4)[0]

    def scale_model_input(self, sample, step_index):
        sigma = self._sigmas_j[step_index]
        return sample / jnp.sqrt(sigma**2 + 1)

    def init_state(self, latents_shape):
        return jnp.zeros((self.order,) + tuple(latents_shape), jnp.float32)

    def step(self, derivs, model_output, step_index, sample):
        """(eps-history, eps, i, x_sigma) -> (new history, prev sample).

        ``sample`` lives in sigma space (x = x0 + sigma * eps-ish);
        model_output is the epsilon prediction at the *scaled* input.
        """
        sigma = self._sigmas_j[step_index]
        x0 = sample.astype(jnp.float32) - sigma * model_output.astype(
            jnp.float32)
        d = (sample.astype(jnp.float32) - x0) / sigma
        derivs = jnp.concatenate([d[None], derivs[:-1]])
        coeffs = self._coeffs[step_index]  # (order,)
        update = jnp.tensordot(coeffs, derivs, axes=1)
        return derivs, (sample.astype(jnp.float32) + update).astype(
            sample.dtype)

    # ---- uniform loop protocol ----

    def init_loop_state(self, latents: jax.Array):
        return self.init_state(latents.shape)

    def scale_input(self, sample, step_index, t):
        return self.scale_model_input(sample, step_index)

    def loop_step(self, state, model_output, step_index, t, sample):
        return self.step(state, model_output, step_index, sample)
