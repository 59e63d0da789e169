"""Isolate the XLA glue cost around the fused kernel (augment, transposes)."""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from ab_opt_tpu.ops.ipa_pallas import _augment, _attention_fwd_call


def timeit(fn, argsets, warmup=3):
    for a in argsets[:warmup]:
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in argsets]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(argsets) * 1e3


def main():
    N, H, L = 32, 12, 128
    QK, P, PV, V = 32, 8, 8, 32
    dt = jnp.bfloat16
    coef = -jnp.abs(jax.random.normal(jax.random.key(9), (H,),
                                      jnp.float32)) * 0.05

    def mk(i):
        kk = jax.random.key(i)
        return (jax.random.normal(kk, (N, L, H * QK), dt),
                jax.random.normal(kk, (N, L, H * QK), dt),
                jax.random.normal(kk, (N, L, H * P * 3), dt),
                jax.random.normal(kk, (N, L, H * P * 3), dt),
                jax.random.normal(kk, (N, L, H * V), dt),
                jax.random.normal(kk, (N, L, H * PV * 3), dt))

    argsets = [mk(i) for i in range(20)]

    aug = jax.jit(lambda q, k, qp, kp, v, vp: _augment(q, k, qp, kp, coef, H, QK))
    print(f'augment (qa,ka)      : {timeit(aug, argsets):7.3f} ms', flush=True)

    def build_vvp(q, k, qp, kp, v, vp):
        vvp = jnp.concatenate([v.reshape(N, L, H, V),
                               vp.reshape(N, L, H, PV * 3)], axis=-1)
        vvp = jnp.concatenate(
            [vvp, jnp.zeros((N, L, H, 8), vvp.dtype)], axis=-1)
        return jnp.swapaxes(vvp, 1, 2)
    print(f'vvp build            : {timeit(jax.jit(build_vvp), argsets):7.3f} ms',
          flush=True)

    bias = jax.random.normal(jax.random.key(0), (N, H, L, L), dt)

    def glue_plus_kernel(q, k, qp, kp, v, vp):
        qa, ka = _augment(q, k, qp, kp, coef, H, QK)
        vvp = build_vvp(q, k, qp, kp, v, vp)
        return _attention_fwd_call(qa, ka, vvp, bias, False)
    print(f'augment+vvp+kernel   : {timeit(jax.jit(glue_plus_kernel), argsets):7.3f} ms',
          flush=True)

    def kernel_only(qa, ka, vvp):
        return _attention_fwd_call(qa, ka, vvp, bias, False)
    ksets = [(jax.random.normal(jax.random.key(i), (N, H, L, 64), dt),
              jax.random.normal(jax.random.key(i + 50), (N, H, L, 64), dt),
              jax.random.normal(jax.random.key(i + 99), (N, H, L, 64), dt))
             for i in range(20)]
    print(f'kernel only          : {timeit(jax.jit(kernel_only), ksets):7.3f} ms',
          flush=True)


if __name__ == '__main__':
    main()
