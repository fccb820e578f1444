"""Discretized mixture-of-logistics distribution (ref: utils/distribution.py).

Loss and sampling for the MOL output head of WaveRNN.  Channel-last layout:
parameters arrive as (..., 3*nr_mix) = [mixture logits | means | log scales].

Numerics follow the published discretized-MoL formulation (PixelCNN++ /
wavenet_vocoder lineage): per-bin probability mass via CDF differences with
edge-case branches at ±0.999 and a log-pdf fallback when the mass underflows.
All branch inputs are clamped so unselected ``where`` branches cannot poison
gradients with NaNs.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

LOG_SCALE_MIN = float(math.log(1e-14))


def discretized_mix_logistic_loss(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    num_classes: int = 65536,
    log_scale_min: float = LOG_SCALE_MIN,
    reduce: bool = True,
) -> jnp.ndarray:
    """Negative log-likelihood of y under the discretized MoL.

    Args:
      y_hat: (B, T, 3*nr_mix) mixture parameters.
      y:     (B, T) or (B, T, 1) targets in [-1, 1].
      num_classes: quantization levels of the underlying signal (2**16).
    """
    assert y_hat.shape[-1] % 3 == 0
    nr_mix = y_hat.shape[-1] // 3

    if y.ndim == y_hat.ndim - 1:
        y = y[..., None]

    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix: 2 * nr_mix]
    log_scales = jnp.maximum(y_hat[..., 2 * nr_mix:], log_scale_min)

    centered_y = y - means
    inv_stdv = jnp.exp(-log_scales)
    half_bin = 1.0 / (num_classes - 1)
    plus_in = inv_stdv * (centered_y + half_bin)
    min_in = inv_stdv * (centered_y - half_bin)

    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)       # log CDF at left edge
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)        # log SF at right edge
    cdf_delta = cdf_plus - cdf_min                          # in-bin mass

    mid_in = inv_stdv * centered_y
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    # underflow fallback: approximate bin mass by density * bin width
    inner_inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        log_pdf_mid - math.log((num_classes - 1) / 2.0),
    )
    inner = jnp.where(y > 0.999, log_one_minus_cdf_min, inner_inner)
    log_probs = jnp.where(y < -0.999, log_cdf_plus, inner)

    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    lse = jax.scipy.special.logsumexp(log_probs, axis=-1)

    if reduce:
        return -jnp.mean(lse)
    return -lse[..., None]


def sample_from_discretized_mix_logistic(
    key: jax.Array,
    y: jnp.ndarray,
    log_scale_min: float = LOG_SCALE_MIN,
) -> jnp.ndarray:
    """Draw samples from the MoL.

    Args:
      key: PRNG key.
      y:   (..., 3*nr_mix) mixture parameters.
    Returns:
      samples in [-1, 1], shape y.shape[:-1].
    """
    assert y.shape[-1] % 3 == 0
    nr_mix = y.shape[-1] // 3
    logit_probs = y[..., :nr_mix]

    k_mix, k_logistic = jax.random.split(key)

    # Gumbel-max over mixture logits
    u = jax.random.uniform(k_mix, logit_probs.shape, minval=1e-5, maxval=1.0 - 1e-5)
    argmax = jnp.argmax(logit_probs - jnp.log(-jnp.log(u)), axis=-1)
    one_hot = jax.nn.one_hot(argmax, nr_mix, dtype=y.dtype)

    means = jnp.sum(y[..., nr_mix: 2 * nr_mix] * one_hot, axis=-1)
    log_scales = jnp.maximum(
        jnp.sum(y[..., 2 * nr_mix:] * one_hot, axis=-1), log_scale_min
    )

    # inverse-CDF sample of the logistic
    u = jax.random.uniform(k_logistic, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
    return jnp.clip(x, -1.0, 1.0)
