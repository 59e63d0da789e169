"""Improved-DDPM cosine variance schedule.

TPU-native rewrite of ``AbDock/src/modules/diffusion/transition.py:10-34``
(plus the posterior-mean coefficients the AbDesign variant adds at
``AbDesign/diffab/modules/diffusion/transition.py:36-43``). Tables are
precomputed host-side in numpy and stored as jnp arrays; the schedule is a
NamedTuple so it is a pytree and can be closed over or passed through jit.

All tables have shape (T+1,) and are indexed directly by the timestep t
(t=0 is the no-noise row).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class VarianceSchedule(NamedTuple):
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alpha_bars: jnp.ndarray
    sigmas: jnp.ndarray
    # x0 = sqrt_recip_alpha_bars * x_t - sqrt_recipm1_alpha_bars * eps
    sqrt_recip_alpha_bars: jnp.ndarray
    sqrt_recipm1_alpha_bars: jnp.ndarray
    # q(x_{t-1} | x_t, x_0) posterior-mean/variance coefficients.
    posterior_variance: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray   # multiplies x_0
    posterior_mean_coef2: jnp.ndarray   # multiplies x_t

    @property
    def num_steps(self) -> int:
        return self.betas.shape[0] - 1

    @classmethod
    def cosine(cls, num_steps: int = 100, s: float = 0.01) -> 'VarianceSchedule':
        T = num_steps
        t = np.arange(0, T + 1, dtype=np.float32)
        f_t = np.cos((np.pi / 2.0) * ((t / T) + s) / (1.0 + s)) ** 2
        alpha_bars = f_t / f_t[0]

        betas = 1.0 - alpha_bars[1:] / alpha_bars[:-1]
        betas = np.concatenate([[0.0], betas]).astype(np.float32)
        betas = np.minimum(betas, 0.999)
        alphas = 1.0 - betas

        sigmas_sq = np.zeros_like(betas)
        sigmas_sq[1:] = (1.0 - alpha_bars[:-1]) / (1.0 - alpha_bars[1:]) * betas[1:]
        sigmas = np.sqrt(sigmas_sq)

        # Posterior coefficients use the cumprod of (1 - clamped beta) like the
        # AbDesign reference (transition.py:37-43); after the 0.999 clamp this
        # cumprod can differ slightly from alpha_bars.
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
        with np.errstate(divide='ignore', invalid='ignore'):
            denom = 1.0 - alphas_cumprod
            denom[denom == 0] = np.inf
            posterior_variance = betas * (1.0 - alphas_cumprod_prev) / denom
            posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / denom
            posterior_mean_coef2 = (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / denom

        as_jnp = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            betas=as_jnp(betas),
            alphas=as_jnp(alphas),
            alpha_bars=as_jnp(alpha_bars),
            sigmas=as_jnp(sigmas),
            sqrt_recip_alpha_bars=as_jnp(np.sqrt(1.0 / alpha_bars)),
            sqrt_recipm1_alpha_bars=as_jnp(np.sqrt(1.0 / alpha_bars - 1.0)),
            posterior_variance=as_jnp(posterior_variance),
            posterior_mean_coef1=as_jnp(posterior_mean_coef1),
            posterior_mean_coef2=as_jnp(posterior_mean_coef2),
        )


def broadcast_coef(table: jnp.ndarray, t: jnp.ndarray, ref_ndim: int) -> jnp.ndarray:
    """Gather ``table[t]`` and right-pad axes to broadcast against a tensor.

    ``t`` may have any shape that is a leading-dims prefix of the target
    tensor's shape (e.g. (N,) against (N, L, 3), or (N, L) against (N, L, 3)).
    """
    c = table[t]
    while c.ndim < ref_ndim:
        c = c[..., None]
    return c
