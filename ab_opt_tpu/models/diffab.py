"""The flagship sequence-structure co-design / docking diffusion model.

TPU-native rewrite of the reference's ``diffab`` model + ``FullDPM``
(``AbDock/src/models/diffab.py``, ``AbDock/src/modules/diffusion/dpm_full.py``).
Architecture:

* ``DiffAbNet`` (flax) holds all parameters: residue/pair embeddings and the
  EpsilonNet denoiser. Encoding runs once per complex; the denoiser runs once
  per diffusion step.
* ``DiffAb`` (plain object) owns the parameter-free transition kernels
  (pytrees of precomputed tables) and exposes pure functions:
  ``loss`` (training), ``sample`` (T->0 reverse loop as lax.scan under jit)
  and ``optimize`` (noise-to-step-t then denoise).

Sampling fan-out is a leading batch axis: replicate the encoded complex and
vmap/shard the trajectories across chips (see ab_opt_tpu.parallel).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..constants import BBHeavyAtom
from ..diffusion import PositionTransition, RotationTransition, SequenceTransition
from ..geometry import construct_3d_basis, random_uniform_so3, rotation_to_so3vec, so3vec_to_rotation
from ..nn import EpsilonNet, PairEmbedding, ResidueEmbedding
from . import losses as L
from ._base import register_model


@dataclasses.dataclass(frozen=True)
class DiffAbConfig:
    res_feat_dim: int = 128
    pair_feat_dim: int = 64
    num_steps: int = 100
    num_layers: int = 6
    obj: str = 'pred_x0'               # 'pred_x0' | 'pred_noise'
    num_atoms: int = 15                # 'full' resolution; 5 = backbone+CB
    num_bins: int = 40                 # pRMSD confidence bins
    dist_min: float = 0.5
    dist_max: float = 19.5
    train_structure: bool = True
    train_sequence: bool = True
    position_mean: Tuple[float, ...] = (0.0, 0.0, 0.0)
    position_scale: Tuple[float, ...] = (10.0,)
    mask_ratio_min: float = 0.0        # random partial-CDR masking (0 = off)
    mask_ratio_max: float = 0.0
    seed: int = 0
    dtype: str = 'float32'             # compute dtype for dense layers
    ipa_impl: str = 'auto'             # 'auto' | 'einsum' | 'pallas' | 'pallas_fused' (experimental)

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == 'bfloat16' else jnp.float32

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> 'DiffAbConfig':
        """Build from a reference-style config dict (model section)."""
        d = dict(d)
        d.pop('type', None)
        diffusion = d.pop('diffusion', {})
        kw = {}
        fields = {f.name for f in dataclasses.fields(cls)}
        resolution = d.pop('resolution', 'full')
        kw['num_atoms'] = 15 if resolution == 'full' else 5
        for src in (d, diffusion):
            for k, v in src.items():
                if k == 'eps_net_opt':
                    kw['num_layers'] = v.get('num_layers', 6)
                elif k in fields:
                    kw[k] = tuple(v) if isinstance(v, list) else v
        return cls(**kw)


class DiffAbNet(nn.Module):
    """Parameter-bearing part: embeddings + denoiser (invoked via methods)."""

    cfg: DiffAbConfig

    def setup(self):
        c = self.cfg
        dt = c.compute_dtype
        self.residue_embed = ResidueEmbedding(c.res_feat_dim, c.num_atoms, dtype=dt)
        self.pair_embed = PairEmbedding(c.pair_feat_dim, c.num_atoms, dtype=dt)
        use_pallas = (c.ipa_impl in ('pallas', 'pallas_fused')
                      or (c.ipa_impl == 'auto'
                          and jax.default_backend() == 'tpu'))
        self.eps_net = EpsilonNet(c.res_feat_dim, c.pair_feat_dim, c.num_layers,
                                  num_bins=c.num_bins, dtype=dt,
                                  use_pallas=use_pallas)

    def encode(self, batch, remove_structure: bool, remove_sequence: bool):
        """Build res/pair features + frames with leak-proof context masks
        (ref models/diffab.py:39-83)."""
        context_mask = (batch['mask_heavyatom'][:, :, BBHeavyAtom.CA]
                        & ~batch['generate_flag'])
        structure_mask = context_mask if remove_structure else None
        sequence_mask = context_mask if remove_sequence else None

        res_feat = self.residue_embed(
            aa=batch['aa'], res_nb=batch['res_nb'], chain_nb=batch['chain_nb'],
            pos_atoms=batch['pos_heavyatom'], mask_atoms=batch['mask_heavyatom'],
            fragment_type=batch['fragment_type'],
            structure_mask=structure_mask, sequence_mask=sequence_mask)
        pair_feat = self.pair_embed(
            aa=batch['aa'], res_nb=batch['res_nb'], chain_nb=batch['chain_nb'],
            pos_atoms=batch['pos_heavyatom'], mask_atoms=batch['mask_heavyatom'],
            structure_mask=structure_mask, sequence_mask=sequence_mask)

        R = construct_3d_basis(
            batch['pos_heavyatom'][:, :, BBHeavyAtom.CA],
            batch['pos_heavyatom'][:, :, BBHeavyAtom.C],
            batch['pos_heavyatom'][:, :, BBHeavyAtom.N])
        p = batch['pos_heavyatom'][:, :, BBHeavyAtom.CA]
        return res_feat, pair_feat, R, p

    def denoise_step(self, v_t, p_t, s_t, res_feat, pair_feat, beta,
                     mask_generate, mask_res, pair_biases=None, fast_weights=None,
                     use_pallas=None, reps: int = 1, fused_encoder_fn=None,
                     fuse_p2n: bool = False, head_weights=None):
        return self.eps_net(v_t, p_t, s_t, res_feat, pair_feat, beta,
                            mask_generate, mask_res, pair_biases=pair_biases,
                            fast_weights=fast_weights, use_pallas=use_pallas,
                            reps=reps, fused_encoder_fn=fused_encoder_fn,
                            fuse_p2n=fuse_p2n, head_weights=head_weights)

    def __call__(self, batch):
        """Init-only path touching every submodule (encode + one denoise)."""
        res_feat, pair_feat, R, p = self.encode(batch, True, True)
        N = batch['aa'].shape[0]
        v = rotation_to_so3vec(R)
        return self.denoise_step(
            v, p, batch['aa'], res_feat, pair_feat, jnp.zeros((N,)),
            batch['generate_flag'], batch['mask'])


@register_model('diffab')
class DiffAb:
    """Model facade: parameters (flax) + transitions (tables) + pure ops."""

    def __init__(self, cfg: DiffAbConfig):
        if isinstance(cfg, dict):
            cfg = DiffAbConfig.from_dict(cfg)
        self.cfg = cfg
        self.net = DiffAbNet(cfg)
        self._use_pallas = (cfg.ipa_impl in ('pallas', 'pallas_fused')
                            or (cfg.ipa_impl == 'auto'
                                and jax.default_backend() == 'tpu'))
        self.trans_rot = RotationTransition.create(cfg.num_steps)
        self.trans_pos = PositionTransition.create(cfg.num_steps)
        self.trans_seq = SequenceTransition.create(cfg.num_steps)
        self._pos_mean = jnp.asarray(cfg.position_mean, jnp.float32).reshape(1, 1, -1)
        self._pos_scale = jnp.asarray(cfg.position_scale, jnp.float32).reshape(1, 1, -1)

    # ----------------------------------------------------------------- utils

    def init(self, key, batch):
        """Initialize parameters from an example (device) batch."""
        return self.net.init(key, batch)

    def normalize_position(self, p):
        return (p - self._pos_mean) / self._pos_scale

    def unnormalize_position(self, p):
        return p * self._pos_scale + self._pos_mean

    def encode(self, params, batch, remove_structure: bool, remove_sequence: bool):
        return self.net.apply(params, batch, remove_structure, remove_sequence,
                              method=DiffAbNet.encode)

    # ----------------------------------------------------------------- train

    def loss(self, params, batch, key, t: Optional[jnp.ndarray] = None,
             denoise_structure: Optional[bool] = None,
             denoise_sequence: Optional[bool] = None) -> Dict[str, jnp.ndarray]:
        """Single-step diffusion training losses (ref dpm_full.py:156-234)."""
        cfg = self.cfg
        denoise_structure = (cfg.train_structure if denoise_structure is None
                             else denoise_structure)
        denoise_sequence = (cfg.train_sequence if denoise_sequence is None
                            else denoise_sequence)

        mask_generate = batch['generate_flag']
        mask_res = batch['mask']

        key, k_mask = jax.random.split(key)
        if cfg.mask_ratio_min > 0:
            # Random partial-CDR masking: only a Bernoulli subset of the CDR
            # is generated this step (ref models/diffab.py:94-97,166-180).
            ratio = jax.random.uniform(k_mask, (), minval=cfg.mask_ratio_min,
                                       maxval=cfg.mask_ratio_max)
            keep = jax.random.bernoulli(jax.random.fold_in(k_mask, 1), ratio,
                                        mask_generate.shape)
            mask_generate = mask_generate & keep
            batch = dict(batch, generate_flag=mask_generate)

        res_feat, pair_feat, R_0, p_0 = self.encode(
            params, batch, denoise_structure, denoise_sequence)
        v_0 = rotation_to_so3vec(R_0)
        s_0 = batch['aa']
        N, LL = s_0.shape

        k_t, k_rot, k_pos, k_seq = jax.random.split(key, 4)
        if t is None:
            t = jax.random.randint(k_t, (N,), 0, cfg.num_steps)
        p_0 = self.normalize_position(p_0)

        if denoise_structure:
            v_noisy, _ = self.trans_rot.add_noise(k_rot, v_0, mask_generate, t)
            p_noisy, eps_p = self.trans_pos.add_noise(k_pos, p_0, mask_generate, t)
        else:
            v_noisy, p_noisy = v_0, p_0
            eps_p = jnp.zeros_like(p_noisy)

        if denoise_sequence:
            _, s_noisy = self.trans_seq.add_noise(k_seq, s_0, mask_generate, t)
        else:
            s_noisy = s_0

        beta = self.trans_pos.sched.betas[t]
        # The fused pallas kernel has a custom VJP (ops/ipa_pallas.py), so
        # training differentiates through whichever IPA impl is configured.
        # The batched output heads are plain jnp ops built from the params
        # (concat/stack/pad), so autodiff carries their gradients back to
        # the per-head Dense kernels.
        head_weights = None
        if self._use_pallas:
            from ..nn.epsilon_net import precompute_head_weights
            head_weights = precompute_head_weights(
                params['params']['eps_net'], dtype=cfg.compute_dtype)
        v_pred, R_pred, p_pred, c_denoised, prmsd_logits = self.net.apply(
            params, v_noisy, p_noisy, s_noisy, res_feat, pair_feat, beta,
            mask_generate, mask_res, None, None,
            head_weights=head_weights, method=DiffAbNet.denoise_step)

        if cfg.obj == 'pred_x0':
            p_true, pred_p0 = p_0, p_pred
        else:
            p_true = p_noisy
            # NB: mirrors the reference exactly (dpm_full.py:189), which
            # passes p_0 — not p_noisy — as the state here.
            pred_p0 = self.trans_pos.pred_start_from_noise(
                p_0, p_pred, mask_generate, t)

        loss_dict = {}
        rmsd = L.masked_rmsd(self.unnormalize_position(pred_p0),
                             self.unnormalize_position(p_0), mask_generate)
        # Per-complex mask = "has any generated residue". The reference uses
        # the POSITIONAL mask_generate[:, 0] (dpm_full.py:195), which is only
        # correct under its train config (initial_patch_size: 0 +
        # remove_anchor: true puts the CDR at patch index 0); with a nonzero
        # initial patch the first residue is context and the prmsd loss
        # silently trains to zero. The semantic mask equals the reference's
        # under the reference's own configs and stays live under every other
        # crop.
        loss_dict['prmsd'] = L.prmsd_loss(
            prmsd_logits, jax.lax.stop_gradient(rmsd),
            mask_generate.any(axis=-1),
            cfg.dist_min, cfg.dist_max, cfg.num_bins)

        if cfg.obj == 'pred_x0':
            loss_dict['dist'] = L.pairwise_distance_loss(
                p_pred, p_true, mask_generate, mask_res)

        R_0 = so3vec_to_rotation(v_0)
        loss_dict['rot'] = L.masked_mean(
            L.rotation_matrix_cosine_loss(R_pred, R_0), mask_generate)

        loss_dict['pos'] = L.masked_mean(
            jnp.sum((p_pred - p_true) ** 2, axis=-1), mask_generate)

        post_true = self.trans_seq.posterior(s_noisy, s_0, t)
        log_post_pred = jnp.log(
            self.trans_seq.posterior(s_noisy, c_denoised, t) + 1e-8)
        loss_dict['seq'] = L.sequence_kl_loss(post_true, log_post_pred, mask_generate)

        return loss_dict

    # ---------------------------------------------------------------- sample

    def _reverse_scan(self, params, key, state_init, res_feat, pair_feat,
                      mask_generate, mask_res, t_start: int,
                      sample_structure: bool, sample_sequence: bool,
                      keep_traj: bool, stride: int = 1, reps: int = 1):
        """Shared T->0 reverse loop as lax.scan (positions stay normalized).

        ``reps`` > 1 marks trajectory fan-out: ``pair_feat`` stays
        per-complex (leading dim N // reps) and is shared by the replicas
        inside the attention (never materialized at full N).
        """
        # The pair features are constant across diffusion steps, so the
        # per-layer pair-bias projections are hoisted out of the scan for
        # the fused pallas path (one einsum per layer per complex instead of
        # per step). The einsum path computes the bias inline (XLA fusion
        # measured faster than reading a hoisted (N, L, L, H) tensor).
        pair_biases = fast_weights = fused_fn = head_weights = None
        if self._use_pallas:
            from ..nn.epsilon_net import precompute_head_weights
            from ..nn.ipa import (precompute_encoder_fast_weights,
                                  precompute_encoder_pair_biases)
            head_weights = precompute_head_weights(
                params['params']['eps_net'], dtype=self.cfg.compute_dtype)
            enc_params = params['params']['eps_net']['encoder']
            pair_biases = precompute_encoder_pair_biases(
                enc_params, pair_feat, mask_res[::reps], self.cfg.num_layers,
                dtype=self.cfg.compute_dtype)
            if self.cfg.ipa_impl in ('pallas_fused', 'auto'):
                # Fully-fused per-layer block kernel (ops/gablock_pallas.py):
                # projections, attention, pair aggregation and the LN/MLP
                # tail in one VMEM-resident kernel per layer. Default for
                # TPU *sampling* ('auto'): measured 195 vs 148 samples/s at
                # the operational 256-trajectory fan-out, parity at 32
                # (PERF.md round 4). Forward-only — training keeps the
                # composable kernel with its custom VJP.
                from ..ops.gablock_pallas import (build_encoder_weights,
                                                  fused_encoder_apply,
                                                  transpose_pair_for_fused)
                bundles = build_encoder_weights(enc_params,
                                                self.cfg.num_layers)
                interp = jax.default_backend() != 'tpu'
                # z transposed (L, Cz, L) once, here (outside the scan):
                # the kernel's pair block keeps L in the lane dim instead
                # of padding Cz=64 to 128 lanes (halves its VMEM).
                z_c = transpose_pair_for_fused(
                    pair_feat.astype(jnp.bfloat16))
                # Replica-tile override for on-chip tuning sweeps
                # (scripts/bench_fused.py); default picks by VMEM budget.
                rt_env = os.environ.get('AB_OPT_FUSED_RT')
                rt = int(rt_env) if rt_env else None
                # Kernel-body restructurings (ops/gablock_pallas.py
                # _gablock_body), comma-separated for on-chip sweeps:
                # AB_OPT_FUSED_BODY=split_gemm,stacked_logits. Default is
                # the measured round-5 winner (scripts/serve_sweep.py,
                # PERF.md: 217 vs 204 samples/s at the 256-trajectory
                # headline): merged_x mega-GEMM + single-pass softmax +
                # dual half-tiles. AB_OPT_FUSED_BODY=none reverts to the
                # base body.
                body_env = os.environ.get('AB_OPT_FUSED_BODY',
                                          'dual,merged_x,fast_softmax')
                if body_env.strip().lower() in ('', 'none', 'base'):
                    body_opts = None
                else:
                    body_opts = {k.strip(): True for k in body_env.split(',')
                                 if k.strip()}
                if body_opts and body_opts.get('lhl'):
                    # lhl bodies take the pair bias pre-transposed to
                    # (Nc, L, H, L) — once here, outside the scan.
                    from ..ops.gablock_pallas import transpose_bias_for_fused
                    pair_biases = [transpose_bias_for_fused(b)
                                   for b in pair_biases]
                # Chained whole-encoder kernel: all layers per grid cell,
                # x VMEM-resident across the stack (opt-out via
                # AB_OPT_FUSED_CHAIN=0; needs the raised scoped-VMEM
                # budget, which jit_sample requests).
                chain = (os.environ.get('AB_OPT_FUSED_CHAIN', '0') != '0'
                         and self.cfg.num_layers > 1)
                if chain:
                    from ..ops.gablock_pallas import (fused_encoder_chained,
                                                      stack_encoder_weights)
                    stacked = stack_encoder_weights(bundles)
                    bias_st = jnp.stack(
                        [b.astype(jnp.bfloat16) for b in pair_biases],
                        axis=1)                    # (Nc, NL, H, L, L)
                    fused_fn = lambda R, t, x, m: fused_encoder_chained(
                        stacked, self.cfg.num_layers, R, t, x, z_c, bias_st,
                        m, reps=reps, rt=rt, interpret=interp,
                        body_opts=body_opts)
                else:
                    fused_fn = lambda R, t, x, m: fused_encoder_apply(
                        bundles, R, t, x, z_c, pair_biases, m, reps=reps,
                        rt=rt, interpret=interp, body_opts=body_opts)
            else:
                fast_weights = precompute_encoder_fast_weights(
                    enc_params, self.cfg.num_layers,
                    dtype=self.cfg.compute_dtype)

        def step(carry, ts):
            # ``t`` stays SCALAR throughout the step: every schedule-table
            # read is one element + broadcast. Indexing tables with (N,) /
            # (N, L) t cost ~0.6 ms/step in per-step gather dispatches.
            t, t_next = ts
            v_t, p_t, s_t, key = carry
            key, k_rot, k_pos, k_seq = jax.random.split(key, 4)
            N = v_t.shape[0]
            beta = jnp.broadcast_to(self.trans_pos.sched.betas[t], (N,))

            v_next, R_next, p_pred, c_denoised, prmsd_logits = self.net.apply(
                params, v_t, p_t, s_t, res_feat, pair_feat, beta,
                mask_generate, mask_res, pair_biases, fast_weights, None, reps,
                fused_fn, self._use_pallas,      # fuse_p2n: sampling-only path
                head_weights, method=DiffAbNet.denoise_step)
            prmsd_score = L.compute_prmsd(prmsd_logits, self.cfg.dist_min,
                                          self.cfg.dist_max)
            if self.cfg.obj == 'pred_x0':
                eps_p = self.trans_pos.pred_noise_from_start(
                    p_t, p_pred, mask_generate, t)
            else:
                eps_p = p_pred

            if stride == 1:
                v_new = self.trans_rot.denoise(k_rot, v_t, v_next,
                                               mask_generate, t)
                p_new = self.trans_pos.denoise(k_pos, p_t, eps_p,
                                               mask_generate, t)
            else:
                # Strided jump: DDIM positions; the rotation head predicts
                # the clean orientation, re-noised at the target level.
                v_new = self.trans_rot.denoise(k_rot, v_t, v_next,
                                               mask_generate, t_next)
                p_new = self.trans_pos.ddim_step(p_t, eps_p, mask_generate,
                                                 t, t_next)
            post, s_new = self.trans_seq.denoise(k_seq, s_t, c_denoised,
                                                 mask_generate, t)
            ppl = L.sequence_perplexity(post, mask_generate)

            if not sample_structure:
                v_new, p_new = v_t, p_t
            if not sample_sequence:
                s_new = s_t

            out = {'prmsd': prmsd_score, 'perplexity': ppl}
            if keep_traj:
                out |= {'v': v_new, 'p': self.unnormalize_position(p_new), 's': s_new}
            return (v_new, p_new, s_new, key), out

        ts = jnp.arange(t_start, 0, -stride)
        ts_next = jnp.maximum(ts - stride, 0)
        (v, p, s, _), outs = jax.lax.scan(step, state_init + (key,),
                                          (ts, ts_next))
        return v, p, s, outs

    def sample(self, params, batch, key, sample_structure: bool = True,
               sample_sequence: bool = True, keep_traj: bool = False,
               contig: Optional[jnp.ndarray] = None,
               num_replicas: int = 1, stride: int = 1
               ) -> Dict[str, jnp.ndarray]:
        """Full reverse-diffusion sampling (ref dpm_full.py:237-302).

        ``num_replicas`` > 1 implements the trajectory fan-out natively:
        encoding (incl. the O(L^2 A^2) pair embedding) runs once on the given
        batch, then features are tiled to batch*num_replicas independent
        stochastic trajectories — replacing the reference's replicate-the-
        input-batch trick (design_for_pdb.py:141) without redundant encodes.

        Returns a dict with final 'v', 'p' (unnormalized), 's', plus per-step
        'prmsd' and 'perplexity' (T, N); if keep_traj, stacked 'traj' arrays.
        """
        mask_generate = batch['generate_flag']
        if contig is not None:
            mask_generate = mask_generate & contig
        mask_res = batch['mask']

        res_feat, pair_feat, R_0, p_ctx = self.encode(
            params, batch, sample_structure, sample_sequence)

        if num_replicas > 1:
            # pair_feat stays per-complex: the replicas share it inside the
            # attention (bias + value-from-pair read it via n // reps).
            rep = lambda x: jnp.repeat(x, num_replicas, axis=0)
            res_feat, R_0, p_ctx = map(rep, (res_feat, R_0, p_ctx))
            mask_generate = rep(mask_generate)
            mask_res = rep(mask_res)
            batch = dict(batch, aa=rep(batch['aa']))
        v = rotation_to_so3vec(R_0)
        p = self.normalize_position(p_ctx)
        s = batch['aa']
        N, LL = s.shape

        k_init_v, k_init_p, k_init_s, k_scan = jax.random.split(key, 4)
        if sample_structure:
            v_rand = random_uniform_so3(k_init_v, (N, LL))
            p_rand = jax.random.normal(k_init_p, p.shape, p.dtype)
            v = jnp.where(mask_generate[..., None], v_rand, v)
            p = jnp.where(mask_generate[..., None], p_rand, p)
        if sample_sequence:
            s_rand = jax.random.randint(k_init_s, s.shape, 0, 19, s.dtype)
            s = jnp.where(mask_generate, s_rand, s)

        v, p, s, outs = self._reverse_scan(
            params, k_scan, (v, p, s), res_feat, pair_feat, mask_generate,
            mask_res, self.cfg.num_steps, sample_structure, sample_sequence,
            keep_traj, stride=stride, reps=num_replicas)

        result = {
            'v': v, 'p': self.unnormalize_position(p), 's': s,
            'prmsd': outs['prmsd'], 'perplexity': outs['perplexity'],
        }
        if keep_traj:
            result['traj'] = {k: outs[k] for k in ('v', 'p', 's')}
        return result

    def optimize(self, params, batch, key, opt_step: int,
                 sample_structure: bool = True, sample_sequence: bool = True,
                 keep_traj: bool = False) -> Dict[str, jnp.ndarray]:
        """Noise the native state to step ``opt_step`` then denoise
        (ref dpm_full.py:304-367)."""
        mask_generate = batch['generate_flag']
        mask_res = batch['mask']

        res_feat, pair_feat, R_0, p_ctx = self.encode(
            params, batch, sample_structure, sample_sequence)
        v = rotation_to_so3vec(R_0)
        p = self.normalize_position(p_ctx)
        s = batch['aa']
        N, LL = s.shape
        t_vec = jnp.full((N,), opt_step, jnp.int32)

        k_rot, k_pos, k_seq, k_scan = jax.random.split(key, 4)
        if sample_structure:
            v, _ = self.trans_rot.add_noise(k_rot, v, mask_generate, t_vec)
            p, _ = self.trans_pos.add_noise(k_pos, p, mask_generate, t_vec)
        if sample_sequence:
            _, s = self.trans_seq.add_noise(k_seq, s, mask_generate, t_vec)

        v, p, s, outs = self._reverse_scan(
            params, k_scan, (v, p, s), res_feat, pair_feat, mask_generate,
            mask_res, opt_step, sample_structure, sample_sequence, keep_traj)

        result = {
            'v': v, 'p': self.unnormalize_position(p), 's': s,
            'prmsd': outs['prmsd'], 'perplexity': outs['perplexity'],
        }
        if keep_traj:
            result['traj'] = {k: outs[k] for k in ('v', 'p', 's')}
        return result
