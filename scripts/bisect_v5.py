"""Bisect the v5 in-model slowdown: time one denoise forward under variants."""
import os
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

variant = sys.argv[1] if len(sys.argv) > 1 else 'full'
if variant == 'nop2n':
    os.environ['AB_IPA_NO_P2N'] = '1'

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _make_batch
from ab_opt_tpu.models import DiffAb, DiffAbConfig
from ab_opt_tpu.models.diffab import DiffAbNet
from ab_opt_tpu.nn.ipa import precompute_encoder_pair_biases
from ab_opt_tpu.geometry import rotation_to_so3vec


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N, L = 32, 128
    cfg = DiffAbConfig(dtype='bfloat16')
    model = DiffAb(cfg)
    batch = _make_batch(N=N, L=L)
    params = model.init(jax.random.key(0), batch)
    res_feat, pair_feat, R0, p0 = model.encode(params, batch, True, True)
    v = rotation_to_so3vec(R0)
    p = model.normalize_position(p0)
    s = batch['aa']
    beta = model.trans_pos.sched.betas[jnp.full((N,), 50)]
    mg, mr = batch['generate_flag'], batch['mask']
    biases = precompute_encoder_pair_biases(
        params['params']['eps_net']['encoder'], pair_feat, mr,
        cfg.num_layers, dtype=cfg.compute_dtype)

    use_pallas = variant != 'einsum'
    f = jax.jit(lambda pa, vv, pp, ss: model.net.apply(
        pa, vv, pp, ss, res_feat, pair_feat, beta, mg, mr,
        pair_biases=biases if use_pallas else None, use_pallas=use_pallas,
        method=DiffAbNet.denoise_step))
    ms = timeit(f, params, v, p, s)
    print(f'denoise fwd [{variant}]: {ms:8.3f} ms', flush=True)


if __name__ == '__main__':
    main()
