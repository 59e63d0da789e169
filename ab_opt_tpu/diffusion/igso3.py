"""Tabulated isotropic Gaussian on SO(3) (IGSO3) angle sampler.

TPU-native rewrite of the reference's ``ApproxAngularDistribution``
(``AbDock/src/modules/common/so3.py:71-146``): per-noise-level angle
histograms are precomputed host-side in numpy (truncated character series,
8192 bins, L=1024 terms), then sampling under jit inverts the tabulated CDF
with a static binary search — no data-dependent ``multinomial`` and no
(N*L, 8192) gathers on device. Small noise levels (sigma <= 0.1) use the
reference's Gaussian approximation branch.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class IGSO3Tables(NamedTuple):
    stddevs: jnp.ndarray       # (S,)
    approx_flag: jnp.ndarray   # (S,) bool — use Gaussian approximation
    cdf: jnp.ndarray           # (S, B-1) inclusive CDF over angle bins
    dx: float                  # bin width = pi / (B - 1)

    @property
    def num_bins(self) -> int:
        return self.cdf.shape[-1] + 1


def _igso3_density(x: np.ndarray, eps: float, num_iters: int) -> np.ndarray:
    """Truncated series for the IGSO3 angle marginal (ref so3.py:83-97)."""
    return _igso3_density_rows(x, np.asarray([eps], np.float64), num_iters)[0]


def _igso3_density_rows(x: np.ndarray, eps: np.ndarray,
                        num_iters: int) -> np.ndarray:
    """Series density for MANY noise levels at once, as one dgemm.

    f[s, b] = weight[b] * sum_l coef[s, l] * ratio[b, l], where ``ratio``
    does not depend on the noise level — so the sum over series terms is a
    (S, L) @ (L, B) matmul instead of a per-level (B, L) reduction. Same
    numbers as the reference's per-level loop (ref so3.py:83-97), ~100x
    faster table builds on a single host core.
    """
    x = np.asarray(x, np.float64)
    ell = np.arange(num_iters, dtype=np.float64)                    # (L,)
    ratio = ((np.sin((ell[None, :] + 0.5) * x[:, None]) + 1e-6)
             / (np.sin(x / 2.0)[:, None] + 1e-6))                   # (B, L)
    weight = (1.0 - np.cos(x)) / np.pi                              # (B,)
    coef = ((2 * ell[None, :] + 1)
            * np.exp(-ell[None, :] * (ell[None, :] + 1)
                     * (eps[:, None] ** 2)))                        # (S, L)
    f = weight[None, :] * (coef @ ratio.T)                          # (S, B)
    return np.nan_to_num(f).clip(min=0.0)


def build_igso3_tables(stddevs, std_threshold: float = 0.1,
                       num_bins: int = 8192, num_iters: int = 1024) -> IGSO3Tables:
    """Precompute CDF tables for a list of noise levels (host-side)."""
    stddevs = np.asarray(stddevs, np.float64)
    x = np.linspace(0.0, math.pi, num_bins)
    cdfs = np.zeros((len(stddevs), num_bins - 1), np.float64)
    series_rows = np.flatnonzero(stddevs > std_threshold)
    if len(series_rows):
        ys = _igso3_density_rows(x, stddevs[series_rows], num_iters)
        # The reference samples a bin via multinomial over y[:-1]; the
        # equivalent CDF is the normalized cumulative sum of those weights.
        w = ys[:, :-1] + 1e-30
        cdfs[series_rows] = np.cumsum(w, axis=1) / w.sum(axis=1, keepdims=True)
    # Gaussian branch used at sample time; histogram never consulted.
    gauss = stddevs <= std_threshold
    cdfs[gauss] = np.linspace(1.0 / (num_bins - 1), 1.0, num_bins - 1)
    return IGSO3Tables(
        stddevs=jnp.asarray(stddevs, jnp.float32),
        approx_flag=jnp.asarray(stddevs <= std_threshold),
        cdf=jnp.asarray(cdfs, jnp.float32),
        dx=math.pi / (num_bins - 1),
    )


def _searchsorted_rows(cdf: jnp.ndarray, rows: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """First index where cdf[rows, idx] >= u, via static binary search.

    cdf: (S, B); rows, u: arbitrary equal shapes. Uses O(log B) scalar-per-
    element gathers instead of materializing (num_elements, B) rows.
    """
    nbins = cdf.shape[-1]
    lo = jnp.zeros_like(rows, dtype=jnp.int32)
    hi = jnp.full_like(lo, nbins - 1)
    for _ in range(int(math.ceil(math.log2(nbins)))):
        mid = (lo + hi) // 2
        v = cdf[rows, mid]
        go_right = v < u
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def sample_igso3_angle(key, tables: IGSO3Tables, t: jnp.ndarray,
                       shape=None) -> jnp.ndarray:
    """Sample rotation angles in [0, pi), one per element of ``shape``
    (defaults to ``t.shape``).

    ``t`` indexes the noise level: per element (shape-matching ``shape``),
    or a SCALAR shared by all elements (the sampling scan's case — one
    uniform t per reverse step). The scalar path gathers one CDF row and
    inverts it with a single compare-and-sum instead of a per-element
    binary search (10 gathers of shape-many elements measured ~0.3 ms/step).
    """
    shape = tuple(shape) if shape is not None else tuple(t.shape)
    k_bin, k_frac, k_gauss = jax.random.split(key, 3)
    u = jax.random.uniform(k_bin, shape)
    if t.ndim == 0:
        cdf_t = tables.cdf[t]                               # (B,)
        bin_idx = jnp.sum(cdf_t < u[..., None], axis=-1).astype(jnp.int32)
        std = tables.stddevs[t]
        flag = tables.approx_flag[t]
    else:
        rows = jnp.broadcast_to(t, shape)
        bin_idx = _searchsorted_rows(tables.cdf, rows, u)
        std = tables.stddevs[rows]
        flag = tables.approx_flag[rows]
    frac = jax.random.uniform(k_frac, shape)
    samples_hist = (bin_idx.astype(jnp.float32) + frac) * tables.dx

    g = std * 2.0 + jax.random.normal(k_gauss, shape) * std
    samples_gauss = jnp.abs(g) % math.pi

    return jnp.where(flag, samples_gauss, samples_hist)


def sample_igso3_vector(key, tables: IGSO3Tables, t: jnp.ndarray,
                        shape=None) -> jnp.ndarray:
    """Random axis, IGSO3-distributed angle -> so3 vectors, shape+(3,).

    Equivalent of the reference's ``random_normal_so3`` (so3.py:141).
    """
    shape = tuple(shape) if shape is not None else tuple(t.shape)
    k_axis, k_angle = jax.random.split(key)
    axis = jax.random.normal(k_axis, shape + (3,))
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-6)
    theta = sample_igso3_angle(k_angle, tables, t, shape)
    return axis * theta[..., None]
