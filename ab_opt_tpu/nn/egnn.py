"""Dense-masked multi-channel EGNN stack (the AbDesign graph path).

TPU-native redesign of ``AbDesign/diffab/modules/MCAttGNN/mc_egnn.py``. The
reference flattens batches into one big graph and uses torch_scatter with
dynamic edge counts; on TPU that means dynamic shapes and gathers. Here every
graph op is a *dense masked* (N, L, L) contraction over adjacency masks —
static shapes, MXU matmuls, vmap/pjit-friendly — which at the reference's
crop sizes (L ~ 100-250) is both simpler and faster than scatter.

Semantics preserved per layer:
* radial features: per-edge Gram matrix + channel cdist of the 3-atom coord
  channels, L2-normalized over the *entire valid edge set* per (c1, c2)
  entry (the reference's F.normalize(dim=0), coord2radial mc_egnn.py:556-565);
* MC_E_GCL: edge MLP -> mean-aggregated coordinate update + summed node
  message with residual (mc_egnn.py:21-192);
* MC_Att_L: per-row softmax attention over inter-segment edges with
  attention-weighted coordinate update (mc_egnn.py:194-330);
* SeqGNN: one attention layer + hydropathy/charge embeddings -> aa logits
  (mc_egnn.py:347-432).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_AA_TYPES_OUT = 21   # 20 aa + UNK (ref num_aa_types)


def radial_features(x, adj):
    """Edge geometry features.

    Args:
      x: (N, L, C, 3) multi-channel coords; adj: (N, L, L) bool.
    Returns:
      (radial, dist, coord_diff): (N, L, L, C, C) x2 and (N, L, L, C, 3),
      with radial/dist L2-normalized over all valid edges per channel pair.
    """
    hi_prec = jax.lax.Precision.HIGHEST   # K=3 coordinate contractions
    diff = x[:, :, None, :, :] - x[:, None, :, :, :]          # (N,L,L,C,3)
    radial = jnp.einsum('nijcx,nijdx->nijcd', diff, diff, precision=hi_prec)
    # Channel-pair distances between x_i and x_j (not differences).
    cross = jnp.einsum('nicx,njdx->nijcd', x, x, precision=hi_prec)
    sq = jnp.sum(x * x, axis=-1)                              # (N,L,C)
    d2 = jnp.clip(sq[:, :, None, :, None] + sq[:, None, :, None, :]
                  - 2.0 * cross, min=1e-12)
    dist = jnp.sqrt(d2)

    m = adj[..., None, None].astype(radial.dtype)
    norm_r = jnp.sqrt(jnp.clip((radial**2 * m).sum(axis=(0, 1, 2)), min=1e-24))
    norm_d = jnp.sqrt(jnp.clip((dist**2 * m).sum(axis=(0, 1, 2)), min=1e-24))
    radial = radial * m / norm_r
    dist = dist * m / norm_d
    return radial, dist, diff


def _edge_geom_flat(radial, dist):
    N, L = radial.shape[:2]
    return jnp.concatenate([radial.reshape(N, L, L, -1),
                            dist.reshape(N, L, L, -1)], axis=-1)


class DenseMCEGCL(nn.Module):
    """Multi-channel E(n)-equivariant conv layer over an adjacency mask."""

    hidden_nf: int
    n_channel: int
    edges_in_d: int = 0
    residual: bool = True
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x, adj, edge_attr=None, deterministic: bool = True):
        """
        h: (N, L, F); x: (N, L, C, 3); adj: (N, L, L) bool;
        edge_attr: (N, L, L, E) or None. Returns (h', x').
        """
        N, L = h.shape[:2]
        act = nn.silu
        drop = lambda v: nn.Dropout(self.dropout, deterministic=deterministic)(v)

        radial, dist, coord_diff = radial_features(x, adj)
        geom = _edge_geom_flat(radial, dist)                  # (N,L,L,2C^2)

        hi = jnp.broadcast_to(h[:, :, None, :], (N, L, L, h.shape[-1]))
        hj = jnp.broadcast_to(h[:, None, :, :], (N, L, L, h.shape[-1]))
        feats = [hi, hj, geom]
        if edge_attr is not None:
            feats.append(edge_attr)
        e_in = jnp.concatenate(feats, axis=-1)
        m = act(nn.Dense(self.hidden_nf, dtype=self.dtype)(e_in))
        m = act(nn.Dense(self.hidden_nf, dtype=self.dtype)(m))
        m = drop(m)
        m = m * adj[..., None]

        # Coordinate update: mean over neighbors of coord_diff * phi_x(m).
        coord_w = nn.Dense(self.hidden_nf, dtype=self.dtype)(m)
        coord_w = nn.Dense(
            self.n_channel, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                0.001**2 * 2.0, 'fan_avg', 'uniform'))(act(coord_w))
        trans = coord_diff * (coord_w * adj[..., None])[..., None]
        count = jnp.clip(adj.sum(axis=2), min=1).astype(x.dtype)
        x = x + trans.sum(axis=2) / count[..., None, None]

        # Node update: summed messages + residual.
        agg = m.sum(axis=2)
        out = act(nn.Dense(self.hidden_nf, dtype=self.dtype)(
            jnp.concatenate([h, agg], axis=-1)))
        out = nn.Dense(self.hidden_nf, dtype=self.dtype)(out)
        out = drop(out)
        if self.residual:
            out = h + out
        return out, x


class DenseMCAttention(nn.Module):
    """Cross-segment attention layer over an adjacency mask (MC_Att_L)."""

    hidden_nf: int
    n_channel: int
    edges_in_d: int = 0
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x, adj, edge_attr=None, deterministic: bool = True):
        N, L = h.shape[:2]
        act = nn.silu
        radial, dist, coord_diff = radial_features(x, adj)
        geom = _edge_geom_flat(radial, dist)

        q = nn.Dense(self.hidden_nf, dtype=self.dtype, name='linear_q')(h)
        hj = jnp.broadcast_to(h[:, None, :, :], (N, L, L, h.shape[-1]))
        feats = [geom, hj]
        if edge_attr is not None:
            feats.append(edge_attr)
        kv = nn.Dense(self.hidden_nf * 2, dtype=self.dtype, name='linear_kv')(
            jnp.concatenate(feats, axis=-1))
        k, v = kv[..., :self.hidden_nf], kv[..., self.hidden_nf:]

        logits = jnp.einsum('nif,nijf->nij', q, k)
        logits = jnp.where(adj, logits, -1e9)
        alpha = jax.nn.softmax(logits, axis=-1)
        alpha = jnp.where(adj, alpha, 0.0)                    # rows w/o edges -> 0

        agg = jnp.einsum('nij,nijf->nif', alpha, v)
        agg = nn.Dropout(self.dropout, deterministic=deterministic)(agg)
        h = h + agg

        coord_w = nn.Dense(self.hidden_nf, dtype=self.dtype)(v)
        coord_w = nn.Dense(
            self.n_channel, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                0.001**2 * 2.0, 'fan_avg', 'uniform'))(act(coord_w))
        trans = coord_diff * (alpha[..., None] * coord_w)[..., None]
        x = x + trans.sum(axis=2)
        return h, x, alpha


class DenseSeqGNN(nn.Module):
    """Sequence head: attention + property-conditioning embeddings -> logits."""

    hidden_nf: int
    n_channel: int
    out_node_nf: int = NUM_AA_TYPES_OUT
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x, adj, hydropathy, charge,
                 deterministic: bool = True):
        N, L = h.shape[:2]
        radial, dist, _ = radial_features(x, adj)
        geom = _edge_geom_flat(radial, dist)

        q = nn.Dense(self.hidden_nf, dtype=self.dtype, name='linear_q')(h)
        hj = jnp.broadcast_to(h[:, None, :, :], (N, L, L, h.shape[-1]))
        kv = nn.Dense(self.hidden_nf * 2, dtype=self.dtype, name='linear_kv')(
            jnp.concatenate([geom, hj], axis=-1))
        k, v = kv[..., :self.hidden_nf], kv[..., self.hidden_nf:]
        logits = jnp.einsum('nif,nijf->nij', q, k)
        logits = jnp.where(adj, logits, -1e9)
        alpha = jnp.where(adj, jax.nn.softmax(logits, axis=-1), 0.0)
        agg = jnp.einsum('nij,nijf->nif', alpha, v)
        agg = nn.Dropout(self.dropout, deterministic=deterministic)(agg)
        h = h + agg

        embed_dim = self.hidden_nf // 2
        hyd = nn.Embed(10, embed_dim, dtype=self.dtype)(hydropathy)
        hyd = hyd * (hydropathy > 0)[..., None]               # padding_idx=0
        chg = nn.Embed(10, embed_dim, dtype=self.dtype)(charge)
        chg = chg * (charge > 0)[..., None]

        f = jnp.concatenate([h, hyd, chg], axis=-1)
        f = nn.relu(nn.Dense(f.shape[-1], dtype=self.dtype)(f))
        f = nn.relu(nn.Dense(f.shape[-1], dtype=self.dtype)(f))
        return nn.Dense(self.out_node_nf, dtype=self.dtype)(f)


class DenseMCAttEGNN(nn.Module):
    """n_layers x (ctx GCL + inter-segment attention) + t-embed + out GCL
    (ref MCAttEGNN, mc_egnn.py:434-556)."""

    hidden_nf: int
    out_node_nf: int
    n_channel: int
    in_edge_nf: int = 0
    n_layers: int = 4
    dropout: float = 0.1
    dense: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x, ctx_adj, att_adj, condition,
                 ctx_edge_attr=None, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """
        h: (N, L, F_in); x: (N, L, C, 3); ctx_adj/att_adj: (N, L, L) bool;
        condition: (N, L) noise level beta per node.
        Returns (out, x, hidden): per-node outputs, coords, last hidden.
        """
        h = nn.Dense(self.hidden_nf, dtype=self.dtype, name='linear_in')(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        states = []
        coords = []
        for i in range(self.n_layers):
            h, x = DenseMCEGCL(self.hidden_nf, self.n_channel,
                               edges_in_d=self.in_edge_nf, dropout=self.dropout,
                               dtype=self.dtype, name=f'gcl_{i}')(
                h, x, ctx_adj, ctx_edge_attr, deterministic)
            states.append(h)
            coords.append(x)
            h, x, _ = DenseMCAttention(self.hidden_nf, self.n_channel,
                                       dropout=self.dropout, dtype=self.dtype,
                                       name=f'att_{i}')(
                h, x, att_adj, None, deterministic)

        t_embed = jnp.stack([condition, jnp.sin(condition), jnp.cos(condition)],
                            axis=-1)
        h = nn.Dense(self.hidden_nf, dtype=self.dtype, name='time_embedding')(
            jnp.concatenate([h, t_embed], axis=-1))

        h, x = DenseMCEGCL(self.hidden_nf, self.n_channel,
                           edges_in_d=self.in_edge_nf, dropout=self.dropout,
                           dtype=self.dtype, name='out_layer')(
            h, x, ctx_adj, ctx_edge_attr, deterministic)
        hidden = h
        states.append(h)
        coords.append(x)
        if self.dense:
            h = jnp.concatenate(states, axis=-1)
            x = jnp.mean(jnp.stack(coords), axis=0)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = nn.Dense(self.out_node_nf, dtype=self.dtype, name='linear_out')(h)
        return out, x, hidden


def build_adjacency(ca_pos, fragment_type, mask, ctx_cutoff: float = 8.0,
                    inter_cutoff: float = 12.0):
    """Radial adjacency masks (ref ProteinFeature, mc_att_model.py:28-108).

    ctx: same fragment segment within 8 A (CA); inter: different segments
    within 12 A. Self-loops and padded residues excluded.
    """
    N, L = mask.shape
    d2 = jnp.sum((ca_pos[:, :, None, :] - ca_pos[:, None, :, :]) ** 2, axis=-1)
    valid = mask[:, :, None] & mask[:, None, :]
    not_self = ~jnp.eye(L, dtype=bool)[None]
    same_seg = fragment_type[:, :, None] == fragment_type[:, None, :]
    ctx_adj = valid & not_self & same_seg & (d2 <= ctx_cutoff**2)
    inter_adj = valid & not_self & ~same_seg & (d2 <= inter_cutoff**2)
    return ctx_adj, inter_adj
