"""Experiment: attention-kernel restructurings at the 256-rep bench shape.

Variants (all per-layer, reps=256 of one complex, L=128, H=12):
  v0  current production kernel (per-head dots, alphas output)
  v1  phase-separated: all logits dots, one softmax, all value dots
  v2  batched dot_general over heads
  v3  v1 without the alphas output (quantifies the alphas HBM store)
  v4  v3 + in-kernel p2n aggregation (z resident, l-batched dots)

Prints ms/call for each + the XLA p2n einsum for reference.
"""
import functools
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ab_opt_tpu.ops.ipa_pallas import (_attention_fwd_call, _pick_tile,
                                       p2n_aggregate, _DA, _DV)

ITERS = 20


def chain_time(make_step, init):
    @jax.jit
    def run(x):
        def body(c, _):
            return make_step(c), 0
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c
    out = run(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(init)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


# --------------------------------------------------------------------- #
def _v1_kernel(qa_ref, ka_ref, vvp_ref, bias_ref, out_ref, alphas_ref, *, H,
               store_alphas=True):
    f32 = jnp.float32
    logits = []
    for h in range(H):
        sl = slice(h * _DA, (h + 1) * _DA)
        logits.append(jax.lax.dot_general(
            qa_ref[:, sl], ka_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32))
    TI = logits[0].shape[0]
    big = jnp.stack(logits, 0) + bias_ref[...].astype(f32)   # (H, TI, L)
    alpha = jax.nn.softmax(big, axis=-1)
    if store_alphas:
        alphas_ref[...] = alpha.astype(alphas_ref.dtype)
    ab = alpha.astype(vvp_ref.dtype)
    for h in range(H):
        sv = slice(h * _DV, (h + 1) * _DV)
        out_ref[:, sv] = jnp.dot(
            ab[h], vvp_ref[:, sv], preferred_element_type=f32
        ).astype(out_ref.dtype)


def v1_call(qa, ka, vvp, bias, reps, store_alphas=True):
    N, L = qa.shape[:2]
    H = bias.shape[1]
    TI = _pick_tile(L)
    grid = (N, L // TI)
    row = lambda d: pl.BlockSpec((None, TI, d), lambda n, i: (n, i, 0))
    full = lambda d: pl.BlockSpec((None, L, d), lambda n, i: (n, 0, 0))
    b_spec = pl.BlockSpec((None, H, TI, L), lambda n, i: (n // reps, 0, i, 0))
    a_spec = pl.BlockSpec((None, H, TI, L), lambda n, i: (n, 0, i, 0))
    if store_alphas:
        out, alphas = pl.pallas_call(
            functools.partial(_v1_kernel, H=H, store_alphas=True),
            grid=grid,
            in_specs=[row(H * _DA), full(H * _DA), full(H * _DV), b_spec],
            out_specs=(row(H * _DV), a_spec),
            out_shape=(jax.ShapeDtypeStruct((N, L, H * _DV), qa.dtype),
                       jax.ShapeDtypeStruct((N, H, L, L), qa.dtype)),
        )(qa, ka, vvp, bias)
        return out, alphas
    def kern(qa_ref, ka_ref, vvp_ref, bias_ref, out_ref):
        _v1_kernel(qa_ref, ka_ref, vvp_ref, bias_ref, out_ref, None, H=H,
                   store_alphas=False)
    out = pl.pallas_call(
        kern, grid=grid,
        in_specs=[row(H * _DA), full(H * _DA), full(H * _DV), b_spec],
        out_specs=row(H * _DV),
        out_shape=jax.ShapeDtypeStruct((N, L, H * _DV), qa.dtype),
    )(qa, ka, vvp, bias)
    return out


def _v2_kernel(qa_ref, ka_ref, vvp_ref, bias_ref, out_ref, alphas_ref, *, H):
    f32 = jnp.float32
    TI = qa_ref.shape[0]
    L = ka_ref.shape[0]
    qa = qa_ref[...].reshape(TI, H, _DA).transpose(1, 0, 2)   # (H, TI, DA)
    ka = ka_ref[...].reshape(L, H, _DA).transpose(1, 0, 2)    # (H, L, DA)
    logits = jax.lax.dot_general(
        qa, ka, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32)                 # (H, TI, L)
    logits = logits + bias_ref[...].astype(f32)
    alpha = jax.nn.softmax(logits, axis=-1)
    alphas_ref[...] = alpha.astype(alphas_ref.dtype)
    vv = vvp_ref[...].reshape(L, H, _DV).transpose(1, 0, 2)   # (H, L, DV)
    out = jax.lax.dot_general(
        alpha.astype(vvp_ref.dtype), vv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32)                 # (H, TI, _DV)
    out_ref[...] = (out.transpose(1, 0, 2)
                    .reshape(TI, H * _DV).astype(out_ref.dtype))


def v2_call(qa, ka, vvp, bias, reps):
    N, L = qa.shape[:2]
    H = bias.shape[1]
    TI = _pick_tile(L)
    grid = (N, L // TI)
    row = lambda d: pl.BlockSpec((None, TI, d), lambda n, i: (n, i, 0))
    full = lambda d: pl.BlockSpec((None, L, d), lambda n, i: (n, 0, 0))
    b_spec = pl.BlockSpec((None, H, TI, L), lambda n, i: (n // reps, 0, i, 0))
    a_spec = pl.BlockSpec((None, H, TI, L), lambda n, i: (n, 0, i, 0))
    return pl.pallas_call(
        functools.partial(_v2_kernel, H=H),
        grid=grid,
        in_specs=[row(H * _DA), full(H * _DA), full(H * _DV), b_spec],
        out_specs=(row(H * _DV), a_spec),
        out_shape=(jax.ShapeDtypeStruct((N, L, H * _DV), qa.dtype),
                   jax.ShapeDtypeStruct((N, H, L, L), qa.dtype)),
    )(qa, ka, vvp, bias)


def _v4_kernel(qa_ref, ka_ref, vvp_ref, bias_ref, z_ref, out_ref, p2n_ref,
               *, H):
    f32 = jnp.float32
    logits = []
    for h in range(H):
        sl = slice(h * _DA, (h + 1) * _DA)
        logits.append(jax.lax.dot_general(
            qa_ref[:, sl], ka_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32))
    big = jnp.stack(logits, 0) + bias_ref[...].astype(f32)   # (H, TI, L)
    alpha = jax.nn.softmax(big, axis=-1)
    ab = alpha.astype(vvp_ref.dtype)
    for h in range(H):
        sv = slice(h * _DV, (h + 1) * _DV)
        out_ref[:, sv] = jnp.dot(
            ab[h], vvp_ref[:, sv], preferred_element_type=f32
        ).astype(out_ref.dtype)
    # p2n: out[l, h, c] = sum_j alpha[h, l, j] z[l, j, c]
    # batched dot over l: (TI batch) x (H, L) . (L, C)
    at = ab.transpose(1, 0, 2)                     # (TI, H, L)
    p2n = jax.lax.dot_general(
        at, z_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32)                # (TI, H, C)
    p2n_ref[...] = p2n.astype(p2n_ref.dtype)


def v4_call(qa, ka, vvp, bias, z, reps):
    N, L = qa.shape[:2]
    H = bias.shape[1]
    Cz = z.shape[-1]
    TI = _pick_tile(L)
    grid = (N, L // TI)
    row = lambda d: pl.BlockSpec((None, TI, d), lambda n, i: (n, i, 0))
    full = lambda d: pl.BlockSpec((None, L, d), lambda n, i: (n, 0, 0))
    b_spec = pl.BlockSpec((None, H, TI, L), lambda n, i: (n // reps, 0, i, 0))
    z_spec = pl.BlockSpec((None, TI, L, Cz), lambda n, i: (n // reps, i, 0, 0))
    return pl.pallas_call(
        functools.partial(_v4_kernel, H=H),
        grid=grid,
        in_specs=[row(H * _DA), full(H * _DA), full(H * _DV), b_spec, z_spec],
        out_specs=(row(H * _DV),
                   pl.BlockSpec((None, TI, H, Cz), lambda n, i: (n, i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((N, L, H * _DV), qa.dtype),
                   jax.ShapeDtypeStruct((N, L, H, Cz), qa.dtype)),
    )(qa, ka, vvp, bias, z)


def main():
    reps, H, L, Cz = 256, 12, 128, 64
    N = reps
    dt = jnp.bfloat16
    kk = jax.random.key(0)
    qa = jax.random.normal(kk, (N, L, H * _DA), dt)
    ka = jax.random.normal(kk, (N, L, H * _DA), dt)
    vvp = jax.random.normal(kk, (N, L, H * _DV), dt)
    bias = jax.random.normal(kk, (1, H, L, L), dt)
    z = jax.random.normal(kk, (1, L, L, Cz), dt)

    perturb = lambda o: (qa + 0 * o[..., :1, None].sum() if o.ndim else qa)

    def mk(fn, uses_z=False, n_out=2):
        def step(c):
            args = (c, ka, vvp, bias) + ((z,) if uses_z else ())
            r = fn(*args)
            first = r[0] if isinstance(r, tuple) else r
            return c + 0 * first.mean().astype(c.dtype)
        return step

    def try_variant(label, fn, uses_z=False):
        try:
            t = chain_time(mk(fn, uses_z=uses_z), qa)
            print(f'{label:40s}{t:7.3f} ms', flush=True)
        except Exception as e:
            print(f'{label:40s}FAILED: {str(e)[:120]}', flush=True)

    try_variant('v0 current (per-head, alphas out):',
                lambda *a: _attention_fwd_call(*a[:4], False, reps))
    try_variant('v1 phase-separated (alphas out):',
                lambda *a: v1_call(*a[:4], reps, True))
    try_variant('v2 batched dot_general (alphas out):',
                lambda *a: v2_call(*a[:4], reps))
    try_variant('v3 v1, no alphas store:',
                lambda *a: v1_call(*a[:4], reps, False))
    try_variant('v4 v3 + in-kernel p2n:',
                lambda *a: v4_call(*a, reps), uses_z=True)

    # XLA p2n for reference
    alphas = jax.nn.softmax(jax.random.normal(kk, (N, H, L, L)), -1).astype(dt)
    t5 = chain_time(lambda c: c + 0 * p2n_aggregate(c, z, reps).mean(
        ).astype(c.dtype), alphas)
    print(f'XLA p2n einsum (alphas read from HBM):  {t5:7.3f} ms')


if __name__ == '__main__':
    main()
