"""Small NN building blocks (ref: AbDock/src/modules/common/layers.py, nn.py)."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class AngularEncoding(nn.Module):
    """Multi-frequency sin/cos encoding of angles (ref layers.py:85-106).

    Frequency bands are [1..k] and [1, 1/2, ..., 1/k]; output per input dim is
    ``1 + 4 * num_funcs`` channels: [x, sin(x*f)..., cos(x*f)...].
    """

    num_funcs: int = 3

    def get_out_dim(self, in_dim: int) -> int:
        return in_dim * (1 + 2 * 2 * self.num_funcs)

    @nn.compact
    def __call__(self, x):
        funcs = jnp.asarray(
            [i + 1 for i in range(self.num_funcs)]
            + [1.0 / (i + 1) for i in range(self.num_funcs)], x.dtype)
        y = x[..., None] * funcs                       # (..., d, 2k)
        code = jnp.concatenate(
            [x[..., None], jnp.sin(y), jnp.cos(y)], axis=-1)   # (..., d, 4k+1)
        return code.reshape(x.shape[:-1] + (-1,))


def distance_to_bins_onehot(dist, dist_min: float, dist_max: float, num_bins: int):
    """One-hot nearest-bin encoding over linspace(dist_min, dist_max, num_bins).

    Equivalent of the reference's ``DistanceToBins(use_onehot=True)``
    (layers.py:17-60) used by the pRMSD confidence target.
    dist: (...,) -> (..., num_bins).
    """
    offsets = jnp.linspace(dist_min, dist_max, num_bins, dtype=jnp.float32)
    diff = jnp.abs(dist[..., None] - offsets)
    idx = jnp.argmin(diff, axis=-1)
    return jnp.eye(num_bins, dtype=jnp.float32)[idx]


class MLP(nn.Module):
    """Dense/ReLU stack; hidden widths ``features[:-1]``, linear final layer."""

    features: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype)(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        return x


class PerResiduePredictor(nn.Module):
    """LayerNorm + 3-layer MLP head (ref nn.py:164-188); returns logits."""

    no_bins: int
    c_hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s):
        # AlphaFold-style init vocabulary, matching the reference's Linear
        # init choices exactly (nn.py:174-176: relu/relu/final).
        from .inits import final_init, relu_init
        s = nn.LayerNorm(epsilon=1e-10, dtype=jnp.float32)(s)
        s = nn.relu(nn.Dense(self.c_hidden, dtype=self.dtype,
                             kernel_init=relu_init)(s))
        s = nn.relu(nn.Dense(self.c_hidden, dtype=self.dtype,
                             kernel_init=relu_init)(s))
        return nn.Dense(self.no_bins, dtype=self.dtype,
                        kernel_init=final_init)(s)
