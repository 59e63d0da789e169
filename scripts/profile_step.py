"""Decompose the per-step sampling cost on the real chip.

Measures, at the bench shape (N=32, L=128, bf16):
  * full sample() per-step cost (100-step scan / 100)
  * one denoiser forward (eps_net incl. seq mixer + heads), pallas vs einsum
  * GAEncoder alone (6 blocks), pallas vs einsum
  * one fused pallas attention call alone
  * projections-only (everything in GABlock except attention)

Usage: python scripts/profile_step.py [N] [L]
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_batch
from ab_opt_tpu.models import DiffAb, DiffAbConfig
from ab_opt_tpu.nn.ipa import GAEncoder


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    print(f'profile at N={N}, L={L}, backend={jax.default_backend()}',
          flush=True)

    cfg = DiffAbConfig(dtype='bfloat16')
    model = DiffAb(cfg)
    batch = _make_batch(N=N, L=L)
    params = model.init(jax.random.key(0), batch)

    # ---- full sample (per step) -----------------------------------------
    sample = jax.jit(lambda p, b, k: model.sample(p, b, k))
    ms = timeit(sample, params, batch, jax.random.key(1), iters=3, warmup=1)
    print(f'full sample()          : {ms:8.1f} ms  ({ms/cfg.num_steps:6.3f} ms/step, '
          f'{N*1000/ms:.1f} samples/s)', flush=True)

    # ---- one denoiser forward -------------------------------------------
    res_feat, pair_feat, R0, p0 = model.encode(params, batch, True, True)
    from ab_opt_tpu.geometry import rotation_to_so3vec
    v = rotation_to_so3vec(R0)
    p = model.normalize_position(p0)
    s = batch['aa']
    beta = model.trans_pos.sched.betas[jnp.full((N,), 50)]
    mg, mr = batch['generate_flag'], batch['mask']

    from ab_opt_tpu.models.diffab import DiffAbNet
    from ab_opt_tpu.nn.ipa import precompute_encoder_pair_biases
    pair_biases = precompute_encoder_pair_biases(
        params['params']['eps_net']['encoder'], pair_feat, mr,
        cfg.num_layers, dtype=cfg.compute_dtype)

    def denoise(use_pallas, biases):
        f = jax.jit(lambda pa, vv, pp, ss: model.net.apply(
            pa, vv, pp, ss, res_feat, pair_feat, beta, mg, mr,
            pair_biases=biases, use_pallas=use_pallas,
            method=DiffAbNet.denoise_step))
        return timeit(f, params, v, p, s)

    print(f'denoise fwd (pallas)   : {denoise(True, pair_biases):8.3f} ms',
          flush=True)
    print(f'denoise fwd (pallas, inline bias): {denoise(True, None):8.3f} ms',
          flush=True)
    print(f'denoise fwd (einsum)   : {denoise(False, None):8.3f} ms',
          flush=True)

    # ---- encoder alone -----------------------------------------------------
    enc = GAEncoder(cfg.res_feat_dim, cfg.pair_feat_dim, cfg.num_layers,
                    dtype=cfg.compute_dtype, use_pallas=True)
    ep = enc.init(jax.random.key(0), R0, p, res_feat, pair_feat, mr)
    eb = precompute_encoder_pair_biases(ep['params'], pair_feat, mr,
                                        cfg.num_layers, cfg.compute_dtype)
    for name, up, biases in (('pallas', True, eb), ('einsum', False, None)):
        f = jax.jit(lambda epp, rf: enc.apply(epp, R0, p, rf, pair_feat, mr,
                                              pair_biases=biases,
                                              use_pallas=up))
        print(f'encoder 6-blk ({name:6s}): {timeit(f, ep, res_feat):8.3f} ms',
              flush=True)

    # ---- one pallas attention call alone ----------------------------------
    from ab_opt_tpu.ops.ipa_pallas import (fused_ipa_from_flat,
                                           precompute_pair_bias)
    H, QK, V, P, PV = 12, 32, 32, 8, 8
    kk = jax.random.key(2)
    dt = cfg.compute_dtype
    q = jax.random.normal(kk, (N, L, H*QK), dt)
    k2 = jax.random.normal(kk, (N, L, H*QK), dt)
    qp = jax.random.normal(kk, (N, L, H*P*3), dt)
    kp = jax.random.normal(kk, (N, L, H*P*3), dt)
    vv = jax.random.normal(kk, (N, L, H*V), dt)
    vp = jax.random.normal(kk, (N, L, H*PV*3), dt)
    z = pair_feat
    pw = jax.random.normal(kk, (cfg.pair_feat_dim, H), dt)
    coef = jnp.ones((H,), jnp.float32)
    mask_f = mr.astype(jnp.float32)
    bias_hm = precompute_pair_bias(z, pw, mask_f, out_dtype=dt)
    f = jax.jit(lambda *a: fused_ipa_from_flat(*a, pair_bias=bias_hm))
    ms = timeit(f, q, k2, qp, kp, vv, vp, z, pw, coef, mask_f)
    print(f'1x fused attn+p2n      : {ms:8.3f} ms  (x6 = {6*ms:.3f})',
          flush=True)

    # HBM traffic estimate per call: bias in + alphas out + p2n einsum.
    by = (2 * N * H * L * L + N * L * cfg.pair_feat_dim * L) * z.dtype.itemsize
    print(f'   bias+alpha+z /call  : {by/1e6:.1f} MB '
          f'(~{by/819e9*1e3:.3f} ms at 819 GB/s)', flush=True)


if __name__ == '__main__':
    main()
