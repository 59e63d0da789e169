"""AbDesign's graph-path co-design model (``diff_gnn``).

TPU-native rewrite of ``AbDesign/diffab/models/diff_gnn.py:26-401``: the
flattened-graph + torch_scatter formulation becomes dense batched (N, L)
tensors with adjacency masks (see ab_opt_tpu.nn.egnn). Pipeline per step:

  init_mask (pseudo-coord interpolation of the CDR, :89-110) ->
  radial ctx/inter adjacency (8 / 12 A) -> GraphEmbedding (residue embed w/
  hotspot conditioning + pair feats as dense edge attrs) -> DenseMCAttEGNN
  denoises 3-atom coords -> DenseSeqGNN predicts aa (hydropathy/charge
  conditioning) -> pred_x0 losses {rot, Ca-pos, bb-pos, seq, accuracy} or
  posterior sampling with ``denoise_from_p0``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..constants import BBHeavyAtom, backbone_atom_coordinates
from ..diffusion import PositionTransition, RotationTransition
from ..geometry import (
    construct_3d_basis,
    local_to_global,
    random_uniform_so3,
    rotation_to_so3vec,
    so3vec_to_rotation,
)
from ..nn import PairEmbedding, ResidueEmbedding
from ..nn.egnn import (
    NUM_AA_TYPES_OUT,
    DenseMCAttEGNN,
    DenseSeqGNN,
    build_adjacency,
)
from . import losses as L
from ._base import register_model


@dataclasses.dataclass(frozen=True)
class DiffGNNConfig:
    res_feat_dim: int = 128
    edge_feat_dim: int = 128
    hidden_size: int = 128
    num_steps: int = 500
    num_atoms: int = 3                # N, CA, C coordinate channels
    n_layers: int = 6
    dropout: float = 0.1
    dense: bool = False
    hotspot: bool = True
    objective: str = 'pred_x0'
    position_mean: Tuple[float, ...] = (0.0,)
    position_scale: Tuple[float, ...] = (10.0,)
    train_structure: bool = True
    train_sequence: bool = True
    ctx_cutoff: float = 8.0
    inter_cutoff: float = 12.0
    dtype: str = 'float32'

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == 'bfloat16' else jnp.float32

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> 'DiffGNNConfig':
        d = dict(d)
        d.pop('type', None)
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in d.items() if k in fields}
        return cls(**kw)


class DiffGNNNet(nn.Module):
    """Parameter-bearing part: embeddings + EGNN + sequence head."""

    cfg: DiffGNNConfig

    def setup(self):
        c = self.cfg
        dt = c.compute_dtype
        self.residue_embed = ResidueEmbedding(c.res_feat_dim, c.num_atoms, dtype=dt)
        self.pair_embed = PairEmbedding(c.edge_feat_dim, c.num_atoms, dtype=dt)
        self.gnn = DenseMCAttEGNN(
            hidden_nf=c.hidden_size, out_node_nf=c.hidden_size,
            n_channel=c.num_atoms, in_edge_nf=c.edge_feat_dim,
            n_layers=c.n_layers, dropout=c.dropout, dense=c.dense, dtype=dt)
        self.seqgnn = DenseSeqGNN(c.hidden_size, c.num_atoms,
                                  out_node_nf=NUM_AA_TYPES_OUT,
                                  dropout=c.dropout, dtype=dt)

    def embed(self, batch, remove_structure: bool, remove_sequence: bool):
        """Node + pair features with leak-proof masks (ref diff_gnn.py:327-373)."""
        context_mask = (batch['mask_heavyatom'][:, :, BBHeavyAtom.CA]
                        & ~batch['generate_flag'])
        structure_mask = context_mask if remove_structure else None
        sequence_mask = context_mask if remove_sequence else None
        hotspot = batch.get('hotspot_label') if self.cfg.hotspot else None

        res_feat = self.residue_embed(
            aa=batch['aa'], res_nb=batch['res_nb'], chain_nb=batch['chain_nb'],
            pos_atoms=batch['pos_heavyatom'], mask_atoms=batch['mask_heavyatom'],
            fragment_type=batch['fragment_type'],
            structure_mask=structure_mask, sequence_mask=sequence_mask,
            hotspot=hotspot)
        pair_feat = self.pair_embed(
            aa=batch['aa'], res_nb=batch['res_nb'], chain_nb=batch['chain_nb'],
            pos_atoms=batch['pos_heavyatom'], mask_atoms=batch['mask_heavyatom'],
            structure_mask=structure_mask, sequence_mask=sequence_mask)
        return res_feat, pair_feat

    def denoise(self, h0, noised_coord, ctx_adj, inter_adj, condition,
                ctx_edge_attr, hydropathy, charge, deterministic=True):
        out, z, hidden = self.gnn(h0, noised_coord, ctx_adj, inter_adj,
                                  condition, ctx_edge_attr, deterministic)
        aa_logits = self.seqgnn(out, z, inter_adj, hydropathy, charge,
                                deterministic)
        return aa_logits, z

    def __call__(self, batch):
        """Init-only path touching every submodule."""
        N, LL = batch['aa'].shape
        res_feat, pair_feat = self.embed(batch, True, True)
        coord = batch['pos_heavyatom'][:, :, :self.cfg.num_atoms]
        ctx_adj, inter_adj = build_adjacency(
            coord[:, :, 1], batch['fragment_type'], batch['mask'])
        hyd = batch.get('hydropathy', jnp.full((N, LL), 3, jnp.int32))
        chg = batch.get('charge', jnp.full((N, LL), 4, jnp.int32))
        return self.denoise(res_feat, coord, ctx_adj, inter_adj,
                            jnp.zeros((N, LL)), pair_feat, hyd, chg)


def interpolate_masked_coords(coord, generate_flag, mask):
    """Pseudo-coordinates for the to-be-generated span: linear interpolation
    between the flanking anchors (ref diff_gnn.py:89-110, vectorized).

    coord: (N, L, C, 3); generate_flag/mask: (N, L).
    """
    N, L = generate_flag.shape
    idx = jnp.arange(L)
    start = jnp.min(jnp.where(generate_flag, idx[None, :], L), axis=1)   # (N,)
    end = jnp.max(jnp.where(generate_flag, idx[None, :], -1), axis=1)
    left = jnp.clip(start - 1, 0, L - 1)
    right = jnp.clip(end + 1, 0, L - 1)

    l_coord = jnp.take_along_axis(coord, left[:, None, None, None], axis=1)
    r_coord = jnp.take_along_axis(coord, right[:, None, None, None], axis=1)
    n_span = (end - start + 2).astype(coord.dtype)[:, None, None, None]
    frac = (idx[None, :] - start[:, None] + 1).astype(coord.dtype)
    interp = l_coord + (r_coord - l_coord) * frac[:, :, None, None] / n_span
    return jnp.where(generate_flag[:, :, None, None], interp, coord)


@register_model('diff_gnn')
class DiffGNN:
    """Facade: params + transitions + pure training/sampling ops."""

    def __init__(self, cfg: DiffGNNConfig):
        if isinstance(cfg, dict):
            cfg = DiffGNNConfig.from_dict(cfg)
        self.cfg = cfg
        self.net = DiffGNNNet(cfg)
        self.trans_rot = RotationTransition.create(cfg.num_steps)
        self.trans_pos = PositionTransition.create(cfg.num_steps)
        self._pos_mean = jnp.asarray(cfg.position_mean, jnp.float32)
        self._pos_scale = jnp.asarray(cfg.position_scale, jnp.float32)
        self._ideal_ala_bb = jnp.asarray(backbone_atom_coordinates[0])  # (3,3)

    def init(self, key, batch):
        return self.net.init({'params': key, 'dropout': jax.random.fold_in(key, 1)},
                             batch)

    def normalize_position(self, p):
        return (p - self._pos_mean) / self._pos_scale

    def unnormalize_position(self, p):
        return p * self._pos_scale + self._pos_mean

    # ------------------------------------------------------------------ common

    def _prepare(self, params, batch, remove_structure, remove_sequence):
        cfg = self.cfg
        coord = batch['pos_heavyatom'][:, :, :cfg.num_atoms].astype(jnp.float32)
        aa = batch['aa']
        gen = batch['generate_flag']
        mask = batch['mask']
        N, LL = aa.shape

        masked_coord = interpolate_masked_coords(coord, gen, mask)
        # Edges from *masked* coords: no leakage of generated geometry.
        ctx_adj, inter_adj = build_adjacency(
            masked_coord[:, :, BBHeavyAtom.CA], batch['fragment_type'], mask,
            cfg.ctx_cutoff, cfg.inter_cutoff)

        res_feat, pair_feat = self.net.apply(
            params, batch, remove_structure, remove_sequence,
            method=DiffGNNNet.embed)
        # Pair features become dense ctx edge attributes (pair2edge analog).
        ctx_edge_attr = pair_feat * ctx_adj[..., None]

        coord_n = self.normalize_position(coord)
        R_0 = construct_3d_basis(coord_n[..., BBHeavyAtom.CA, :],
                                 coord_n[..., BBHeavyAtom.C, :],
                                 coord_n[..., BBHeavyAtom.N, :])
        v_0 = rotation_to_so3vec(R_0)
        p_0 = coord_n[..., BBHeavyAtom.CA, :]

        hyd = batch.get('hydropathy', jnp.full((N, LL), 3, jnp.int32))
        chg = batch.get('charge', jnp.full((N, LL), 4, jnp.int32))
        return (coord_n, aa, gen, mask, res_feat, ctx_adj, inter_adj,
                ctx_edge_attr, R_0, v_0, p_0, hyd, chg)

    def _noised_coord(self, coord_n, p_t, v_t, gen):
        """Place idealized ALA N/CA/C by the noisy frame on generated residues
        (ref reconstruct_noised_coord, diff_gnn.py:375-393)."""
        R = so3vec_to_rotation(v_t)
        bb = jnp.broadcast_to(self._ideal_ala_bb / self._pos_scale,
                              coord_n.shape[:2] + (3, 3))
        recon = local_to_global(R, p_t, bb)
        return jnp.where(gen[:, :, None, None], recon, coord_n)

    def _denoiser(self, params, state, static, key=None, deterministic=True):
        (coord_n, gen, mask, res_feat, ctx_adj, inter_adj, ctx_edge_attr,
         hyd, chg) = static
        v_t, p_t, t_res = state
        noised_coord = self._noised_coord(coord_n, p_t, v_t, gen)
        # t_res may be scalar (sampling fast path) or (N, L) (training).
        condition = jnp.broadcast_to(self.trans_pos.sched.betas[t_res],
                                     gen.shape)
        rngs = {} if deterministic else {'dropout': key}
        aa_logits, z = self.net.apply(
            params, res_feat, noised_coord, ctx_adj, inter_adj, condition,
            ctx_edge_attr, hyd, chg, deterministic,
            method=DiffGNNNet.denoise, rngs=rngs)
        # Padding rows carry all-zero coords; construct_3d_basis would
        # normalize a zero vector there and the NaN *gradient* survives the
        # masked rot loss (NaN*0=NaN in the backward). Substitute a
        # well-conditioned idealized backbone on invalid rows — their value
        # never enters any loss (masked) or the sampled output (gen-gated).
        bb = jnp.broadcast_to(self._ideal_ala_bb / self._pos_scale, z.shape)
        z_safe = jnp.where(mask[:, :, None, None], z, bb)
        R_pred = construct_3d_basis(z_safe[..., BBHeavyAtom.CA, :],
                                    z_safe[..., BBHeavyAtom.C, :],
                                    z_safe[..., BBHeavyAtom.N, :])
        p_pred = z[..., BBHeavyAtom.CA, :]
        return aa_logits, z, R_pred, p_pred

    # ------------------------------------------------------------------- train

    def loss(self, params, batch, key, t: Optional[jnp.ndarray] = None
             ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        (coord_n, aa, gen, mask, res_feat, ctx_adj, inter_adj, ctx_edge_attr,
         R_0, v_0, p_0, hyd, chg) = self._prepare(
            params, batch, cfg.train_structure, cfg.train_sequence)
        N, LL = aa.shape

        k_t, k_rot, k_pos, k_drop = jax.random.split(key, 4)
        if t is None:
            t = jax.random.randint(k_t, (N,), 0, cfg.num_steps)
        t_res = jnp.broadcast_to(t[:, None], (N, LL))

        v_noisy, _ = self.trans_rot.add_noise(k_rot, v_0, gen, t)
        p_noisy, eps_p = self.trans_pos.add_noise(k_pos, p_0, gen, t)

        static = (coord_n, gen, mask, res_feat, ctx_adj, inter_adj,
                  ctx_edge_attr, hyd, chg)
        aa_logits, z, R_pred, p_pred = self._denoiser(
            params, (v_noisy, p_noisy, t_res), static, k_drop,
            deterministic=False)

        gm = gen & mask
        loss_dict = {}
        loss_dict['rot'] = L.masked_mean(
            L.rotation_matrix_cosine_loss(R_pred, R_0), gm)
        loss_dict['pos'] = L.masked_mean(
            jnp.sum((p_pred - p_0) ** 2, axis=-1), gm)
        loss_dict['bb_pos'] = L.masked_mean(
            jnp.sum((z - coord_n) ** 2, axis=-1).mean(-1), gm)
        logp = jax.nn.log_softmax(aa_logits, axis=-1)
        # Padding rows carry aa=21 (outside the logits' 21 classes 0..20);
        # take_along_axis fills OOB gathers with NaN, which masked_mean
        # cannot mask out (NaN*0=NaN) — clamp before gathering.
        aa_safe = jnp.clip(aa, 0, aa_logits.shape[-1] - 1)
        ce = -jnp.take_along_axis(logp, aa_safe[..., None], axis=-1)[..., 0]
        loss_dict['seq'] = L.masked_mean(ce, gm)
        acc = (aa_logits.argmax(-1) == aa).astype(jnp.float32)
        loss_dict['accuracy'] = jax.lax.stop_gradient(L.masked_mean(acc, gm))
        return loss_dict

    # ------------------------------------------------------------------ sample

    def sample(self, params, batch, key, sample_structure: bool = True,
               sample_sequence: bool = True, keep_traj: bool = False,
               num_replicas: int = 1, stride: int = 1
               ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        (coord_n, aa, gen, mask, res_feat, ctx_adj, inter_adj, ctx_edge_attr,
         R_0, v_0, p_0, hyd, chg) = self._prepare(
            params, batch, sample_structure, sample_sequence)
        if num_replicas > 1:
            # Trajectory fan-out: embed/edge-construct once, tile after.
            rep = lambda x: jnp.repeat(x, num_replicas, axis=0)
            (coord_n, aa, gen, mask, res_feat, ctx_adj, inter_adj,
             ctx_edge_attr, R_0, v_0, p_0, hyd, chg) = map(
                rep, (coord_n, aa, gen, mask, res_feat, ctx_adj, inter_adj,
                      ctx_edge_attr, R_0, v_0, p_0, hyd, chg))
        N, LL = aa.shape

        k_v, k_p, k_scan = jax.random.split(key, 3)
        if sample_structure:
            v = jnp.where(gen[..., None], random_uniform_so3(k_v, (N, LL)), v_0)
            p = jnp.where(gen[..., None],
                          jax.random.normal(k_p, p_0.shape, p_0.dtype), p_0)
        else:
            v, p = v_0, p_0
        s = aa

        static = (coord_n, gen, mask, res_feat, ctx_adj, inter_adj,
                  ctx_edge_attr, hyd, chg)
        v, p, s, outs = self._reverse_loop(
            params, k_scan, (v, p, s), static, cfg.num_steps,
            sample_structure, sample_sequence, keep_traj, stride)

        result = {'v': v, 'p': self.unnormalize_position(p), 's': s}
        if keep_traj:
            result['traj'] = outs
        return result

    def _reverse_loop(self, params, key, state_init, static, t_start: int,
                      sample_structure: bool, sample_sequence: bool,
                      keep_traj: bool, stride: int = 1):
        """Shared t_start -> 0 reverse loop as lax.scan (normalized coords)."""
        gen = static[1]
        N, LL = gen.shape

        def step(carry, ts):
            # ``t`` stays SCALAR: schedule tables are read once per step and
            # broadcast (see DiffAb._reverse_scan for the measurements).
            t, t_next = ts
            v_t, p_t, s_t, key = carry
            key, k_rd, k_pd = jax.random.split(key, 3)
            aa_logits, z, R_pred, p0_pred = self._denoiser(
                params, (v_t, p_t, t), static)
            v_next = rotation_to_so3vec(R_pred)
            if stride == 1:
                v_new = self.trans_rot.denoise(k_rd, v_t, v_next, gen, t)
                p_new = self.trans_pos.denoise_from_p0(k_pd, p_t, p0_pred,
                                                       gen, t)
            else:
                v_new = self.trans_rot.denoise(k_rd, v_t, v_next, gen,
                                               t_next)
                eps_p = self.trans_pos.pred_noise_from_start(
                    p_t, p0_pred, gen, t)
                p_new = self.trans_pos.ddim_step(p_t, eps_p, gen, t, t_next)
            s_new = jnp.where(gen, aa_logits.argmax(-1), s_t)
            if not sample_structure:
                v_new, p_new = v_t, p_t
            if not sample_sequence:
                s_new = s_t
            out = {}
            if keep_traj:
                out = {'v': v_new, 'p': self.unnormalize_position(p_new),
                       's': s_new}
            return (v_new, p_new, s_new, key), out

        ts = jnp.arange(t_start, 0, -stride)
        (v, p, s, _), outs = jax.lax.scan(
            step, state_init + (key,), (ts, jnp.maximum(ts - stride, 0)))
        return v, p, s, outs

    def optimize(self, params, batch, key, opt_step: int,
                 sample_structure: bool = True, sample_sequence: bool = True,
                 keep_traj: bool = False) -> Dict[str, jnp.ndarray]:
        """Noise the native CDR state to step ``opt_step`` then denoise.

        The reference declares this path for the graph model too
        (AbDesign/diffab/models/diff_gnn.py:305-324) but its body is dead
        code (references undefined ``self.encode``/``self.diffusion``); this
        is the working equivalent, mirroring DiffAb.optimize: forward-noise
        v/p on the generated span to ``opt_step``, then run the shared
        reverse loop from there. The sequence is re-predicted by the SeqGNN
        along the way (diff_gnn has no sequence diffusion).
        """
        (coord_n, aa, gen, mask, res_feat, ctx_adj, inter_adj, ctx_edge_attr,
         R_0, v_0, p_0, hyd, chg) = self._prepare(
            params, batch, sample_structure, sample_sequence)
        N, LL = aa.shape
        t_vec = jnp.full((N,), opt_step, jnp.int32)

        k_rot, k_pos, k_scan = jax.random.split(key, 3)
        v, p = v_0, p_0
        if sample_structure:
            v, _ = self.trans_rot.add_noise(k_rot, v, gen, t_vec)
            p, _ = self.trans_pos.add_noise(k_pos, p, gen, t_vec)

        static = (coord_n, gen, mask, res_feat, ctx_adj, inter_adj,
                  ctx_edge_attr, hyd, chg)
        v, p, s, outs = self._reverse_loop(
            params, k_scan, (v, p, aa), static, opt_step,
            sample_structure, sample_sequence, keep_traj)

        result = {'v': v, 'p': self.unnormalize_position(p), 's': s}
        if keep_traj:
            result['traj'] = outs
        return result
