"""Micro-benchmarks for the fused IPA pieces on the current backend.

Each op is measured as a 50-iteration lax.scan with a data dependency
chained through the loop (outputs perturb inputs by 0), so the device
cannot overlap, elide, or cache iterations — wall-clock / 50 is true
per-call device time.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from ab_opt_tpu.ops.ipa_pallas import _attention_fwd_call, _fused_attention

ITERS = 50


def chain_time(make_step, init):
    """Time a scan of ITERS chained steps; returns ms/step."""
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


def main():
    N, H, L, Da, Dv, Cz = 32, 12, 128, 64, 64, 64
    dt = jnp.bfloat16
    kk = jax.random.key(0)
    qa = jax.random.normal(kk, (N, H, L, Da), dt)
    ka = jax.random.normal(kk, (N, H, L, Da), dt)
    vvp = jax.random.normal(kk, (N, H, L, Dv), dt)
    bias = jax.random.normal(kk, (N, H, L, L), dt)
    z = jax.random.normal(kk, (N, L, L, Cz), dt)
    alphas_hm = jax.nn.softmax(
        jax.random.normal(kk, (N, H, L, L)), -1).astype(dt)

    def kernel_step(c):
        q = qa + c
        out, alphas = _attention_fwd_call(q, ka, vvp, bias, False)
        return c + 0.0 * out.mean()
    print(f'kernel fwd only        : {chain_time(kernel_step, jnp.bfloat16(0)):7.3f} ms',
          flush=True)

    def p2n_step(c):
        a = alphas_hm + c
        p2n = jnp.einsum('nhij,nijc->nihc', a, z)
        return c + 0.0 * p2n.mean()
    print(f'p2n einsum (head-major): {chain_time(p2n_step, jnp.bfloat16(0)):7.3f} ms',
          flush=True)

    def both_step(c):
        q = qa + c
        out, alphas = _fused_attention(False, q, ka, vvp, bias)
        p2n = jnp.einsum('nhij,nijc->nihc', alphas, z)
        return c + 0.0 * (p2n.mean() + out.mean())
    print(f'kernel + p2n           : {chain_time(both_step, jnp.bfloat16(0)):7.3f} ms',
          flush=True)

    # Whole fused block path as used by GABlock, via fused_ipa_from_flat.
    from ab_opt_tpu.ops.ipa_pallas import fused_ipa_from_flat, precompute_pair_bias
    QK, P, PV = 32, 8, 8
    q0 = jax.random.normal(kk, (N, L, H * QK), dt)
    k0 = jax.random.normal(kk, (N, L, H * QK), dt)
    qp = jax.random.normal(kk, (N, L, H * P * 3), dt)
    kp = jax.random.normal(kk, (N, L, H * P * 3), dt)
    v0 = jax.random.normal(kk, (N, L, H * 32), dt)
    vp = jax.random.normal(kk, (N, L, H * PV * 3), dt)
    coef = -jnp.abs(jax.random.normal(kk, (H,), jnp.float32)) * 0.05
    mask = jnp.ones((N, L), jnp.float32)
    bias_hm = precompute_pair_bias(z, jax.random.normal(kk, (Cz, H), dt),
                                   mask, out_dtype=dt)

    def flat_step(c):
        p2n, node, pts = fused_ipa_from_flat(
            q0 + c, k0, qp, kp, v0, vp, z, None, coef, mask,
            pair_bias=bias_hm)
        return c + 0.0 * (p2n.mean().astype(dt) + node.mean() + pts.mean())
    print(f'fused_ipa_from_flat    : {chain_time(flat_step, jnp.bfloat16(0)):7.3f} ms',
          flush=True)


if __name__ == '__main__':
    main()
