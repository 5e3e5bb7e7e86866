"""Gaussian diffusion process: q/p distributions, losses, and scan-based samplers.

Behavioral parity with reference diffusion/gaussian_diffusion.py:158-963 and
diffusion/respace.py, re-designed for XLA:

- The process is an immutable flax.struct dataclass of precomputed float32
  coefficient arrays (computed in float64 numpy for parity with the reference's
  "use float64 for accuracy", gaussian_diffusion.py:173).
- Respacing is data (timestep_map gathered before the model call), not a model
  wrapper class (reference respace.py:120-132).
- The sampling loops are single `lax.scan`s over the whole (respaced) chain —
  one compiled program per shape instead of a Python loop issuing per-step
  kernels (reference gaussian_diffusion.py:514-561). `denoised_fn` hooks
  (in-painting, test_toy.py:57-69) are traced function arguments.
- Channel layout is (N, T, C) — channels LAST (TPU lane dimension), vs. the
  reference's torch-conventional (N, C, T). The eps/variance split for learned
  sigma is over the last axis.

Parity quirks preserved on purpose:
- x0 clamp to [-1, 2] under clip_denoised (gaussian_diffusion.py:345) — the
  playfield-normalized coordinate range, not the usual [-1, 1].
- VLB uses the frozen (stop-gradient) mean prediction (gaussian_diffusion.py:833).
- RESCALED_* losses scale vb by num_timesteps/1000 (gaussian_diffusion.py:845-847);
  plain L1/MSE (the training default via create_diffusion(use_l1=True)) do not.
- discretized likelihood uses 1/255 bins and a tanh CDF approximation
  (diffusion_utils.py:38-89).
"""
from __future__ import annotations

from typing import Callable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from osu_diffusion_tpu.diffusion import schedule as sched

ModelFn = Callable[..., jnp.ndarray]  # model(x, t) -> (N, T, C') output


# ---------------------------------------------------------------------------
# small math utils (parity: diffusion/diffusion_utils.py)
# ---------------------------------------------------------------------------


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes. Parity: gaussian_diffusion.py:15-19."""
    return x.mean(axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two gaussians, broadcasting. Parity: diffusion_utils.py:9-35."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """tanh approximation of the normal CDF. Parity: diffusion_utils.py:38-43."""
    return 0.5 * (
        1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of data discretized to 1/255 bins. Parity: diffusion_utils.py:63-89."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )


def continuous_gaussian_log_likelihood(x, *, means, log_scales):
    """Parity: diffusion_utils.py:46-60."""
    normalized_x = (x - means) * jnp.exp(-log_scales)
    return -0.5 * (normalized_x**2 + np.log(2.0 * np.pi))


def _extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and append broadcast axes.

    Parity with _extract_into_tensor (gaussian_diffusion.py:951-963) without the
    materializing `+ zeros(shape)` — XLA broadcasts lazily.
    """
    out = arr[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - 1))


# ---------------------------------------------------------------------------
# the process
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class GaussianDiffusion:
    """Immutable bundle of diffusion coefficient arrays (all float32, shape (S,)
    where S = number of *retained* timesteps after respacing).

    `timestep_map` maps local step index -> original-process timestep, fed to the
    model (replaces reference respace.py:120-132 `_WrappedModel`).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    log_betas: jnp.ndarray
    fixed_large_variance: jnp.ndarray
    log_fixed_large_variance: jnp.ndarray
    timestep_map: jnp.ndarray  # int32 (S,)

    # static configuration
    num_timesteps: int = flax.struct.field(pytree_node=False)
    original_num_steps: int = flax.struct.field(pytree_node=False)
    model_mean_type: str = flax.struct.field(pytree_node=False)  # epsilon|xstart|xprev
    model_var_type: str = flax.struct.field(pytree_node=False)
    loss_type: str = flax.struct.field(pytree_node=False)

    # -- q distributions ----------------------------------------------------

    def q_mean_variance(self, x_start, t):
        """q(x_t | x_0). Parity: gaussian_diffusion.py:213-229."""
        nd = x_start.ndim
        mean = _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
        variance = _extract(1.0 - self.alphas_cumprod, t, nd)
        log_variance = _extract(self.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Sample q(x_t | x_0). Parity: gaussian_diffusion.py:231-247."""
        nd = x_start.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        """q(x_{t-1} | x_t, x_0). Parity: gaussian_diffusion.py:249-271."""
        nd = x_t.ndim
        posterior_mean = (
            _extract(self.posterior_mean_coef1, t, nd) * x_start
            + _extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        posterior_variance = _extract(self.posterior_variance, t, nd)
        posterior_log_variance = _extract(self.posterior_log_variance_clipped, t, nd)
        return posterior_mean, posterior_variance, posterior_log_variance

    # -- model call plumbing -------------------------------------------------

    def _call_model(self, model_fn: ModelFn, x, t, model_kwargs: dict | None):
        """Apply the respacing timestep map, then the model."""
        mapped_t = self.timestep_map[t]
        return model_fn(x, mapped_t, **(model_kwargs or {}))

    def _split_learned_variance(self, x, t, model_output):
        """Split (N,T,2C) output into mean-model part and log-variance.

        LEARNED_RANGE interpolates log-variance between the posterior (min) and
        beta (max) in log space. Parity: gaussian_diffusion.py:312-324.
        """
        c = x.shape[-1]
        nd = x.ndim
        model_output, model_var_values = jnp.split(model_output, [c], axis=-1)
        if self.model_var_type == "learned":
            model_log_variance = model_var_values
        else:  # learned_range
            min_log = _extract(self.posterior_log_variance_clipped, t, nd)
            max_log = _extract(self.log_betas, t, nd)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
        return model_output, model_log_variance

    def _predict_xstart_from_eps(self, x_t, t, eps):
        """Parity: gaussian_diffusion.py:371-376."""
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        """Parity: gaussian_diffusion.py:378-382."""
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        nd = x_t.ndim
        return (
            xprev / _extract(self.posterior_mean_coef1, t, nd)
            - _extract(self.posterior_mean_coef2, t, nd)
            / _extract(self.posterior_mean_coef1, t, nd)
            * x_t
        )

    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x,
        t,
        clip_denoised: bool = True,
        denoised_fn: Callable | None = None,
        model_kwargs: dict | None = None,
    ) -> dict[str, jnp.ndarray]:
        """p(x_{t-1} | x_t) and the x_0 prediction. Parity: gaussian_diffusion.py:273-369."""
        nd = x.ndim
        model_output = self._call_model(model_fn, x, t, model_kwargs)

        if self.model_var_type in ("learned", "learned_range"):
            model_output, model_log_variance = self._split_learned_variance(
                x, t, model_output
            )
            model_variance = jnp.exp(model_log_variance)
        elif self.model_var_type == "fixed_large":
            model_variance = _extract(self.fixed_large_variance, t, nd)
            model_log_variance = _extract(self.log_fixed_large_variance, t, nd)
        else:  # fixed_small
            model_variance = _extract(self.posterior_variance, t, nd)
            model_log_variance = _extract(self.posterior_log_variance_clipped, t, nd)

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0)
            if clip_denoised:
                # Parity quirk: playfield-normalized clamp (gaussian_diffusion.py:345)
                x0 = jnp.clip(x0, -1.0, 2.0)
            return x0

        if self.model_mean_type == "xstart":
            pred_xstart = process_xstart(model_output)
        elif self.model_mean_type == "xprev":
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x, t, model_output)
            )
        else:  # epsilon
            pred_xstart = process_xstart(
                self._predict_xstart_from_eps(x, t, model_output)
            )
        model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # -- ancestral sampling --------------------------------------------------

    def p_sample(
        self,
        model_fn: ModelFn,
        x,
        t,
        rng: jax.Array,
        clip_denoised: bool = True,
        denoised_fn: Callable | None = None,
        cond_fn: Callable | None = None,
        model_kwargs: dict | None = None,
    ) -> dict[str, jnp.ndarray]:
        """One ancestral step x_t -> x_{t-1}. Parity: gaussian_diffusion.py:420-467."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            out["mean"] = self.condition_mean(cond_fn, out, x, t, model_kwargs)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(
        self,
        model_fn: ModelFn,
        shape: tuple[int, ...],
        rng: jax.Array,
        noise: jnp.ndarray | None = None,
        clip_denoised: bool = True,
        denoised_fn: Callable | None = None,
        cond_fn: Callable | None = None,
        model_kwargs: dict | None = None,
    ) -> jnp.ndarray:
        """Full ancestral chain as ONE lax.scan over t = S-1 .. 0.

        Replaces the Python generator loop (gaussian_diffusion.py:469-561) —
        jit this (or a caller containing it) and the whole chain is a single
        XLA program.
        """
        if noise is None:
            rng, nrng = jax.random.split(rng)
            noise = jax.random.normal(nrng, shape, jnp.float32)
        n = shape[0]
        steps = jnp.arange(self.num_timesteps - 1, -1, -1)
        rngs = jax.random.split(rng, self.num_timesteps)

        def body(x, step_rng):
            i, r = step_rng
            t = jnp.full((n,), i, dtype=jnp.int32)
            out = self.p_sample(
                model_fn, x, t, r, clip_denoised=clip_denoised,
                denoised_fn=denoised_fn, cond_fn=cond_fn, model_kwargs=model_kwargs,
            )
            return out["sample"], None

        final, _ = jax.lax.scan(body, noise, (steps, rngs))
        return final

    def p_sample_loop_progressive(
        self,
        model_fn: ModelFn,
        shape: tuple[int, ...],
        rng: jax.Array,
        noise: jnp.ndarray | None = None,
        clip_denoised: bool = True,
        denoised_fn: Callable | None = None,
        cond_fn: Callable | None = None,
        model_kwargs: dict | None = None,
    ) -> jnp.ndarray:
        """Like p_sample_loop but returns ALL intermediate samples, stacked on a
        leading axis (S, *shape) — the scan-native replacement for the
        reference's yield-per-step generator (used for denoising animations,
        sample.py:144-172)."""
        if noise is None:
            rng, nrng = jax.random.split(rng)
            noise = jax.random.normal(nrng, shape, jnp.float32)
        n = shape[0]
        steps = jnp.arange(self.num_timesteps - 1, -1, -1)
        rngs = jax.random.split(rng, self.num_timesteps)

        def body(x, step_rng):
            i, r = step_rng
            t = jnp.full((n,), i, dtype=jnp.int32)
            out = self.p_sample(
                model_fn, x, t, r, clip_denoised=clip_denoised,
                denoised_fn=denoised_fn, cond_fn=cond_fn, model_kwargs=model_kwargs,
            )
            return out["sample"], out["sample"]

        _, all_samples = jax.lax.scan(body, noise, (steps, rngs))
        return all_samples

    # -- DDIM ----------------------------------------------------------------

    def ddim_sample(
        self,
        model_fn: ModelFn,
        x,
        t,
        rng: jax.Array,
        clip_denoised: bool = True,
        denoised_fn: Callable | None = None,
        cond_fn: Callable | None = None,
        model_kwargs: dict | None = None,
        eta: float = 0.0,
    ) -> dict[str, jnp.ndarray]:
        """One DDIM step. Parity: gaussian_diffusion.py:563-610."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t, model_kwargs)
        nd = x.ndim
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = _extract(self.alphas_cumprod, t, nd)
        alpha_bar_prev = _extract(self.alphas_cumprod_prev, t, nd)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        noise = jax.random.normal(rng, x.shape, x.dtype)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (nd - 1))
        sample = mean_pred + nonzero * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(
        self,
        model_fn: ModelFn,
        x,
        t,
        clip_denoised: bool = True,
        denoised_fn: Callable | None = None,
        cond_fn: Callable | None = None,
        model_kwargs: dict | None = None,
        eta: float = 0.0,
    ) -> dict[str, jnp.ndarray]:
        """DDIM reverse ODE step x_t -> x_{t+1}. Parity: gaussian_diffusion.py:612-651."""
        assert eta == 0.0, "Reverse ODE only for deterministic path"
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t, model_kwargs)
        nd = x.ndim
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar_next = _extract(self.alphas_cumprod_next, t, nd)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1 - alpha_bar_next) * eps
        )
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(
        self,
        model_fn: ModelFn,
        shape: tuple[int, ...],
        rng: jax.Array,
        noise: jnp.ndarray | None = None,
        clip_denoised: bool = True,
        denoised_fn: Callable | None = None,
        cond_fn: Callable | None = None,
        model_kwargs: dict | None = None,
        eta: float = 0.0,
    ) -> jnp.ndarray:
        """Full DDIM chain as one lax.scan. Parity: gaussian_diffusion.py:653-733."""
        if noise is None:
            rng, nrng = jax.random.split(rng)
            noise = jax.random.normal(nrng, shape, jnp.float32)
        n = shape[0]
        steps = jnp.arange(self.num_timesteps - 1, -1, -1)
        rngs = jax.random.split(rng, self.num_timesteps)

        def body(x, step_rng):
            i, r = step_rng
            t = jnp.full((n,), i, dtype=jnp.int32)
            out = self.ddim_sample(
                model_fn, x, t, r, clip_denoised=clip_denoised,
                denoised_fn=denoised_fn, cond_fn=cond_fn, model_kwargs=model_kwargs,
                eta=eta,
            )
            return out["sample"], None

        final, _ = jax.lax.scan(body, noise, (steps, rngs))
        return final

    # -- guidance ------------------------------------------------------------

    def condition_mean(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Sohl-Dickstein guidance on the mean. Parity: gaussian_diffusion.py:384-396."""
        mapped_t = self.timestep_map[t]
        gradient = cond_fn(x, mapped_t, **(model_kwargs or {}))
        return p_mean_var["mean"] + p_mean_var["variance"] * gradient

    def condition_score(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Song et al. score conditioning. Parity: gaussian_diffusion.py:398-418."""
        nd = x.ndim
        alpha_bar = _extract(self.alphas_cumprod, t, nd)
        eps = self._predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        mapped_t = self.timestep_map[t]
        eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, mapped_t, **(model_kwargs or {}))
        out = dict(p_mean_var)
        out["pred_xstart"] = self._predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(out["pred_xstart"], x, t)
        return out

    # -- training losses -----------------------------------------------------

    def _vb_terms_bpd(
        self, model_fn: ModelFn, x_start, x_t, t, clip_denoised=True, model_kwargs=None
    ) -> dict[str, jnp.ndarray]:
        """Variational bound term in bits. Parity: gaussian_diffusion.py:735-783."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(
            model_fn, x_t, t, clip_denoised=clip_denoised, model_kwargs=model_kwargs
        )
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(
        self,
        model_fn: ModelFn,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
        model_kwargs: dict | None = None,
    ) -> dict[str, jnp.ndarray]:
        """Per-sample training loss. Parity: gaussian_diffusion.py:785-874.

        `noise` must be supplied (JAX-explicit RNG; the reference draws it
        internally at gaussian_diffusion.py:800).
        """
        x_t = self.q_sample(x_start, t, noise)
        terms: dict[str, jnp.ndarray] = {}

        if self.loss_type in ("kl", "rescaled_kl"):
            terms["loss"] = self._vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised=False, model_kwargs=model_kwargs
            )["output"]
            if self.loss_type == "rescaled_kl":
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output = self._call_model(model_fn, x_t, t, model_kwargs)

        if self.model_var_type in ("learned", "learned_range"):
            c = x_t.shape[-1]
            model_output, model_var_values = jnp.split(model_output, [c], axis=-1)
            # Learn variance with the VLB but freeze the mean prediction
            # (parity: gaussian_diffusion.py:833).
            frozen_out = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
            )
            terms["vb"] = self._vb_terms_bpd(
                lambda *args, **kw: frozen_out,
                x_start,
                x_t,
                t,
                clip_denoised=False,
            )["output"]
            if self.loss_type in ("rescaled_mse", "rescaled_l1"):
                # Parity quirk: /1000 VLB scaling (gaussian_diffusion.py:845-847).
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

        if self.model_mean_type == "xprev":
            target = self.q_posterior_mean_variance(x_start, x_t, t)[0]
        elif self.model_mean_type == "xstart":
            target = x_start
        else:
            target = noise

        if self.loss_type in ("l1", "rescaled_l1"):
            terms["l1"] = mean_flat(jnp.abs(target - model_output))
            terms["loss"] = terms["l1"] + terms["vb"] if "vb" in terms else terms["l1"]
        else:
            terms["mse"] = mean_flat((target - model_output) ** 2)
            terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
        return terms

    def _prior_bpd(self, x_start):
        """Parity: gaussian_diffusion.py:876-893."""
        n = x_start.shape[0]
        t = jnp.full((n,), self.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior) / np.log(2.0)

    def calc_bpd_loop(
        self, model_fn: ModelFn, x_start, rng: jax.Array,
        clip_denoised=True, model_kwargs=None,
    ) -> dict[str, jnp.ndarray]:
        """Full VLB, scan over all timesteps. Parity: gaussian_diffusion.py:895-948.

        Returns arrays with a leading (S,) axis in DESCENDING t order, matching
        the reference's iteration order, then stacked as (N, S) like the ref.
        """
        n = x_start.shape[0]
        steps = jnp.arange(self.num_timesteps - 1, -1, -1)
        rngs = jax.random.split(rng, self.num_timesteps)

        def body(_, step_rng):
            i, r = step_rng
            t = jnp.full((n,), i, dtype=jnp.int32)
            noise = jax.random.normal(r, x_start.shape, x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
            out = self._vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised=clip_denoised,
                model_kwargs=model_kwargs,
            )
            eps = self._predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            return None, (
                out["output"],
                mean_flat((out["pred_xstart"] - x_start) ** 2),
                mean_flat((eps - noise) ** 2),
            )

        _, (vb, xstart_mse, mse) = jax.lax.scan(body, None, (steps, rngs))
        vb, xstart_mse, mse = vb.T, xstart_mse.T, mse.T  # (N, S)
        prior_bpd = self._prior_bpd(x_start)
        return {
            "total_bpd": vb.sum(axis=1) + prior_bpd,
            "prior_bpd": prior_bpd,
            "vb": vb,
            "xstart_mse": xstart_mse,
            "mse": mse,
        }


# ---------------------------------------------------------------------------
# factory
# ---------------------------------------------------------------------------


def _build(betas: np.ndarray, timestep_map: np.ndarray, original_num_steps: int,
           model_mean_type: str, model_var_type: str, loss_type: str) -> GaussianDiffusion:
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    if len(posterior_variance) > 1:
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )
        fixed_large_variance = np.append(posterior_variance[1], betas[1:])
    else:
        # 1-step chain (e.g. timestep_respacing="1"/"ddim1"): posterior
        # variance at t=0 is exactly 0 and there is no index 1 to borrow the
        # clip value from; the single step adds no noise either way, so use
        # beta for the log-clipped table instead of indexing out of bounds
        posterior_log_variance_clipped = np.log(betas)
        fixed_large_variance = betas.copy()

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return GaussianDiffusion(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        alphas_cumprod_next=f32(alphas_cumprod_next),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        log_betas=f32(np.log(betas)),
        fixed_large_variance=f32(fixed_large_variance),
        log_fixed_large_variance=f32(np.log(fixed_large_variance)),
        timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
        num_timesteps=int(betas.shape[0]),
        original_num_steps=int(original_num_steps),
        model_mean_type=model_mean_type,
        model_var_type=model_var_type,
        loss_type=loss_type,
    )


def create_diffusion(
    timestep_respacing: str | list | None = "",
    noise_schedule: str = "linear",
    use_kl: bool = False,
    sigma_small: bool = False,
    predict_xstart: bool = False,
    learn_sigma: bool = True,
    rescale_learned_sigmas: bool = False,
    diffusion_steps: int = 1000,
    use_l1: bool = False,
) -> GaussianDiffusion:
    """Factory with the exact reference flag surface (diffusion/__init__.py:10-47)."""
    betas = sched.get_named_beta_schedule(noise_schedule, diffusion_steps)
    if use_kl:
        loss_type = "rescaled_kl"
    elif rescale_learned_sigmas:
        loss_type = "rescaled_l1" if use_l1 else "rescaled_mse"
    else:
        loss_type = "l1" if use_l1 else "mse"
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]
    use_timesteps = sched.space_timesteps(diffusion_steps, timestep_respacing)
    new_betas, timestep_map = sched.respace_betas(betas, use_timesteps)
    return _build(
        new_betas,
        timestep_map,
        original_num_steps=diffusion_steps,
        model_mean_type="xstart" if predict_xstart else "epsilon",
        model_var_type=(
            "learned_range"
            if learn_sigma
            else ("fixed_small" if sigma_small else "fixed_large")
        ),
        loss_type=loss_type,
    )
