"""Microbench: fused GABlock kernel restructurings at the bench shape.

Variants (full fused block, Nc=1, reps=256, L=128, production dims):
  v2   current production kernel (per-(replica,head) unrolled dots)
  v3   replica-batched attention: per head ONE RT-batched dot_general for
       logits and values; softmax batched over (RT, L, L)
  v3c  v3 + wp2n as one two-dim contraction (L, H, Cz) x (H, Cz, F)
       per replica (if Mosaic accepts multi-contracting-dim dots)

Prints ms/call per layer for each.  Usage:
  python scripts/micro_fused_variants.py [reps] [rt]
"""
import functools
import math
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ab_opt_tpu.ops.gablock_pallas import (_gablock_kernel, _layernorm,
                                           _rotate_sections, _pick_rt)
from ab_opt_tpu.ops.ipa_pallas import _DA, _DV, _planar_pool_np

ITERS = 30


def chain_time(fn, x0):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), 0
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c
    out = run(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


# ------------------------------------------------------------------ v3 kernel
def _gablock_kernel_v3(x_ref, R_ref, t_ref, z_ref, bias_ref, mask_ref,
                       w_pts_ref, s_q_ref, s_k_ref, s_v_ref, b_q_ref, b_k_ref,
                       pool_ref, wp2n_ref, wrest_ref, bout_ref, ln1_ref,
                       wm1_ref, wm2_ref, wm3_ref, bm_ref, ln2_ref,
                       out_ref, *, RT, H, QK, V, P, PV, Cz, p2n_2dim=False):
    f32 = jnp.float32
    dt = jnp.bfloat16
    L = x_ref.shape[1]
    rows = RT * L
    HP, HPV = H * P, H * PV
    n_tot = 2 * HP + HPV

    x_in = x_ref[...].reshape(rows, -1).astype(f32)
    x = x_in.astype(dt)
    R = R_ref[...].reshape(rows, 9).astype(dt)
    t = t_ref[...].reshape(rows, 3).astype(dt)

    pts = jnp.dot(x, w_pts_ref[...], preferred_element_type=f32).astype(dt)
    pts_g = _rotate_sections(R, t, pts, n_tot)
    sect = lambda off, w: jnp.concatenate(
        [pts_g[:, c * n_tot + off:c * n_tot + off + w] for c in range(3)],
        axis=-1)
    qp = sect(0, HP)
    kp = sect(HP, HP)
    vp = sect(2 * HP, HPV)

    pool = pool_ref[...]
    sq_q = jnp.dot(qp * qp, pool, preferred_element_type=f32).astype(dt)
    sq_k = jnp.dot(kp * kp, pool, preferred_element_type=f32).astype(dt)
    qa = (jnp.dot(jnp.concatenate([x, qp, sq_q], axis=-1), s_q_ref[...],
                  preferred_element_type=f32).astype(dt) + b_q_ref[...])
    ka = (jnp.dot(jnp.concatenate([x, kp, sq_k], axis=-1), s_k_ref[...],
                  preferred_element_type=f32).astype(dt) + b_k_ref[...])
    vvp = jnp.dot(jnp.concatenate([x, vp], axis=-1), s_v_ref[...],
                  preferred_element_type=f32).astype(dt)

    bias = bias_ref[...].astype(f32)                          # (H, L, L)

    # Replica-batched attention: per head ONE RT-batched dot for logits and
    # values; softmax over (RT, L, L).
    qa3 = qa.reshape(RT, L, H * _DA)
    ka3 = ka.reshape(RT, L, H * _DA)
    vvp3 = vvp.reshape(RT, L, H * _DV)
    alpha_cols = []                    # per h: (L, RT, L)
    outs_h = []                        # per h: (RT, L, _DV)
    for h in range(H):
        sl = slice(h * _DA, (h + 1) * _DA)
        lg = jax.lax.dot_general(qa3[:, :, sl], ka3[:, :, sl],
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=f32)   # (RT, L, L)
        ab = jax.nn.softmax(lg + bias[h][None], axis=-1).astype(dt)
        alpha_cols.append(ab.transpose(1, 0, 2))               # (L, RT, L)
        sv = slice(h * _DV, (h + 1) * _DV)
        outs_h.append(jax.lax.dot_general(
            ab, vvp3[:, :, sv], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).astype(dt))            # (RT, L, _DV)

    # h-major stacked alphas: (L, H*RT, L); index (h, r) -> h*RT + r.
    a_all = jnp.concatenate(alpha_cols, axis=1)
    p2n_all = jax.lax.dot_general(
        a_all, z_ref[...].astype(dt), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32).astype(dt)                # (L, H*RT, Cz)

    feats = []
    y_p2n = []
    for r in range(RT):
        o = jnp.concatenate([outs_h[h][r] for h in range(H)], axis=-1)
        node = jnp.concatenate(
            [o[:, h * _DV:h * _DV + V] for h in range(H)], axis=-1)
        pts_o = jnp.concatenate(
            [jnp.concatenate(
                [o[:, h * _DV + V + c * PV:h * _DV + V + (c + 1) * PV]
                 for h in range(H)], axis=-1) for c in range(3)], axis=-1)
        fp = _rotate_sections(R[r * L:(r + 1) * L], t[r * L:(r + 1) * L],
                              pts_o, HPV, transpose=True,
                              sub_t=True).astype(f32)
        sumsq = (jnp.square(fp[:, :HPV]) + jnp.square(fp[:, HPV:2 * HPV])
                 + jnp.square(fp[:, 2 * HPV:]))
        dist = jnp.sqrt(sumsq + 1e-12)
        inv = 1.0 / (jnp.sqrt(sumsq + 1e-8) + 1e-4)
        direction = fp * jnp.concatenate([inv, inv, inv], axis=-1)
        if p2n_2dim:
            # (L, H, Cz) x (H, Cz, F) two-dim contraction in one dot.
            p2n_r = jnp.stack([p2n_all[:, h * RT + r, :] for h in range(H)],
                              axis=1)                          # (L, H, Cz)
            acc = jax.lax.dot_general(
                p2n_r, wp2n_ref[...], (((1, 2), (0, 1)), ((), ())),
                preferred_element_type=f32)
        else:
            acc = jnp.dot(p2n_all[:, r, :], wp2n_ref[0],
                          preferred_element_type=f32)
            for h in range(1, H):
                acc = acc + jnp.dot(p2n_all[:, h * RT + r, :], wp2n_ref[h],
                                    preferred_element_type=f32)
        y_p2n.append(acc)
        feats.append(jnp.concatenate(
            [node, fp.astype(dt), dist.astype(dt), direction.astype(dt)],
            axis=-1))

    feat_rest = jnp.concatenate(feats, axis=0)
    y = (jnp.dot(feat_rest, wrest_ref[...], preferred_element_type=f32)
         + jnp.concatenate(y_p2n, axis=0) + bout_ref[...].astype(f32))
    y = y * mask_ref[...].reshape(rows, 1).astype(f32)

    x1 = _layernorm(x_in + y, ln1_ref[0].astype(f32), ln1_ref[1].astype(f32))
    h1 = jax.nn.relu(jnp.dot(x1.astype(dt), wm1_ref[...],
                             preferred_element_type=f32)
                     + bm_ref[0].astype(f32))
    h2 = jax.nn.relu(jnp.dot(h1.astype(dt), wm2_ref[...],
                             preferred_element_type=f32)
                     + bm_ref[1].astype(f32))
    h3 = (jnp.dot(h2.astype(dt), wm3_ref[...], preferred_element_type=f32)
          + bm_ref[2].astype(f32))
    out = _layernorm(x1 + h3, ln2_ref[0].astype(f32), ln2_ref[1].astype(f32))
    out_ref[...] = out.reshape(RT, L, -1).astype(out_ref.dtype)


def run_layer(kernel_fn, x, R9, t, z, bias, mask, wb, reps, rt, extra=None):
    N, L, F = x.shape
    Nc = N // reps
    RT = rt
    H, QK, V, P, PV = wb['dims']
    Cz = z.shape[-1]
    tile = lambda a: a.reshape(Nc, reps, L, -1)
    x4, R4, t4, m4 = tile(x), tile(R9), tile(t), tile(mask)
    grid = (Nc, reps // RT)
    blk = lambda d: pl.BlockSpec((None, RT, L, d), lambda n, j: (n, j, 0, 0))
    z_spec = pl.BlockSpec((None, L, L, Cz), lambda n, j: (n, 0, 0, 0))
    b_spec = pl.BlockSpec((None, H, L, L), lambda n, j: (n, 0, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda n, j: (0,) * len(shape))
    kw = dict(RT=RT, H=H, QK=QK, V=V, P=P, PV=PV, Cz=Cz)
    if extra:
        kw |= extra
    kernel = functools.partial(kernel_fn, **kw)
    w_names = ('w_pts', 's_q', 's_k', 's_v', 'b_q', 'b_k', 'pool',
               'wp2n', 'wrest', 'bout', 'ln1', 'wm1', 'wm2', 'wm3', 'bm',
               'ln2')
    out = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[blk(F), blk(9), blk(3), z_spec, b_spec, blk(1)]
                 + [const(wb[n].shape) for n in w_names],
        out_specs=blk(F),
        out_shape=jax.ShapeDtypeStruct((Nc, reps, L, F), jnp.float32),
    )(x4, R4, t4, z, bias, m4, *(wb[n] for n in w_names))
    return out.reshape(N, L, F)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rt = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    L, F, H, QK, V, P, PV, Cz = 128, 128, 12, 32, 32, 8, 8, 64
    N = reps
    key = jax.random.key(0)
    ks = jax.random.split(key, 24)
    f32, bf = jnp.float32, jnp.bfloat16
    nrm = lambda k, s, d=bf: (jax.random.normal(k, s, f32) * 0.1).astype(d)
    n_tot = 2 * H * P + H * PV
    HP, HPV = H * P, H * PV
    n_p2n_rows = H * Cz
    F_out = F
    rest_rows = H * (V + 7 * PV)
    wb = {
        'w_pts': nrm(ks[0], (F, 3 * n_tot)),
        's_q': nrm(ks[1], (F + 3 * HP + H, H * _DA)),
        's_k': nrm(ks[2], (F + 3 * HP + H, H * _DA)),
        's_v': nrm(ks[3], (F + 3 * HPV, H * _DV)),
        'b_q': nrm(ks[4], (1, H * _DA)),
        'b_k': nrm(ks[5], (1, H * _DA)),
        'pool': jnp.asarray(_planar_pool_np(H, 3 * P), bf),
        'wp2n': nrm(ks[6], (H, Cz, F_out)),
        'wrest': nrm(ks[7], (rest_rows, F_out)),
        'bout': nrm(ks[8], (1, F_out), f32),
        'ln1': nrm(ks[9], (2, F), f32),
        'wm1': nrm(ks[10], (F, F)),
        'wm2': nrm(ks[11], (F, F)),
        'wm3': nrm(ks[12], (F, F)),
        'bm': nrm(ks[13], (3, F), f32),
        'ln2': nrm(ks[14], (2, F), f32),
        'dims': (H, QK, V, P, PV),
    }
    x = jax.random.normal(ks[15], (N, L, F), f32)
    R9 = jax.random.normal(ks[16], (N, L, 9), f32)
    t = jax.random.normal(ks[17], (N, L, 3), f32)
    z = nrm(ks[18], (1, L, L, Cz))
    bias = jax.random.normal(ks[19], (1, H, L, L), f32).astype(bf)
    mask = jnp.ones((N, L, 1), f32)

    variants = [
        ('v2 current', _gablock_kernel, None),
        ('abl baseline', _gablock_kernel_abl, {}),
        ('abl skip_sect', _gablock_kernel_abl, {'skip_sect': True}),
        ('abl skip_sq', _gablock_kernel_abl, {'skip_sq': True}),
        ('abl skip_values', _gablock_kernel_abl, {'skip_values': True}),
        ('abl fake_feat', _gablock_kernel_abl, {'fake_feat': True}),
        ('abl thin_ops', _gablock_kernel_abl, {'thin_ops': True}),
        ('abl floor', _gablock_kernel_abl,
         {'skip_sect': True, 'skip_sq': True, 'skip_values': True,
          'fake_feat': True, 'fake_alpha': True, 'skip_rot': True,
          'skip_p2n': True, 'skip_mlp': True}),
    ]
    want = sys.argv[3].split(',') if len(sys.argv) > 3 else None
    if want:
        variants = [v for v in variants
                    if any(w in v[0] for w in want)]
    for name, kern, extra in variants:
        try:
            fn = lambda xx: run_layer(kern, xx, R9, t, z, bias, mask, wb,
                                      reps, rt, extra)
            ms = chain_time(fn, x)
            print(f'{name:24s} rt={rt}: {ms:7.3f} ms/layer')
        except Exception as e:
            print(f'{name:24s} rt={rt}: FAILED {type(e).__name__}: '
                  f'{str(e)[:200]}')


# ----------------------------------------------------------------- ablations
def _gablock_kernel_abl(x_ref, R_ref, t_ref, z_ref, bias_ref, mask_ref,
                        w_pts_ref, s_q_ref, s_k_ref, s_v_ref, b_q_ref,
                        b_k_ref, pool_ref, wp2n_ref, wrest_ref, bout_ref,
                        ln1_ref, wm1_ref, wm2_ref, wm3_ref, bm_ref, ln2_ref,
                        out_ref, *, RT, H, QK, V, P, PV, Cz,
                        skip_p2n=False, fake_softmax=False, fake_alpha=False,
                        skip_rot=False, skip_mlp=False, skip_out=False,
                        skip_sect=False, skip_sq=False, fake_feat=False,
                        skip_values=False, skip_wpts=False, thin_ops=False):
    import jax
    import jax.numpy as jnp
    f32 = jnp.float32
    dt = jnp.bfloat16
    L = x_ref.shape[1]
    rows = RT * L
    HP, HPV = H * P, H * PV
    n_tot = 2 * HP + HPV

    x_in = x_ref[...].reshape(rows, -1).astype(f32)
    x = x_in.astype(dt)
    R = R_ref[...].reshape(rows, 9).astype(dt)
    t = t_ref[...].reshape(rows, 3).astype(dt)

    pts = jnp.dot(x, w_pts_ref[...], preferred_element_type=f32).astype(dt)
    if skip_rot:
        pts_g = pts
    else:
        pts_g = _rotate_sections(R, t, pts, n_tot)
    if skip_sect:
        qp = pts_g[:, :3 * HP]
        kp = pts_g[:, 3 * HP:6 * HP]
        vp = pts_g[:, 6 * HP:6 * HP + 3 * HPV]
    else:
        sect = lambda off, w: jnp.concatenate(
            [pts_g[:, c * n_tot + off:c * n_tot + off + w] for c in range(3)],
            axis=-1)
        qp = sect(0, HP)
        kp = sect(HP, HP)
        vp = sect(2 * HP, HPV)

    pool = pool_ref[...]
    if skip_sq:
        sq_q = qp[:, :H]
        sq_k = kp[:, :H]
    else:
        sq_q = jnp.dot(qp * qp, pool, preferred_element_type=f32).astype(dt)
        sq_k = jnp.dot(kp * kp, pool, preferred_element_type=f32).astype(dt)
    if thin_ops:
        # Dense rows only (x block) — measures MAC-boundedness of the
        # fast-weight operand GEMMs (numerically wrong).
        F = x.shape[1]
        qa = (jnp.dot(x, s_q_ref[:F], preferred_element_type=f32).astype(dt)
              + b_q_ref[...])
        ka = (jnp.dot(x, s_k_ref[:F], preferred_element_type=f32).astype(dt)
              + b_k_ref[...])
        vvp = jnp.dot(x, s_v_ref[:F], preferred_element_type=f32).astype(dt)
    else:
        qa = (jnp.dot(jnp.concatenate([x, qp, sq_q], axis=-1), s_q_ref[...],
                      preferred_element_type=f32).astype(dt) + b_q_ref[...])
        ka = (jnp.dot(jnp.concatenate([x, kp, sq_k], axis=-1), s_k_ref[...],
                      preferred_element_type=f32).astype(dt) + b_k_ref[...])
        vvp = jnp.dot(jnp.concatenate([x, vp], axis=-1), s_v_ref[...],
                      preferred_element_type=f32).astype(dt)

    bias = bias_ref[...].astype(f32)

    outs = []
    alpha_rows = []
    for r in range(RT):
        qa_r = qa[r * L:(r + 1) * L]
        ka_r = ka[r * L:(r + 1) * L]
        if fake_alpha:
            ab = (bias * 0.01).astype(dt)
        else:
            logits = [jax.lax.dot_general(
                qa_r[:, h * _DA:(h + 1) * _DA],
                ka_r[:, h * _DA:(h + 1) * _DA],
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
                for h in range(H)]
            lg = jnp.stack(logits, 0) + bias
            if fake_softmax:
                ab = (lg * 0.01).astype(dt)
            else:
                ab = jax.nn.softmax(lg, axis=-1).astype(dt)
        alpha_rows.append(ab.transpose(1, 0, 2))
        vvp_r = vvp[r * L:(r + 1) * L]
        if skip_values:
            outs.append(vvp_r)
        else:
            outs.append(jnp.concatenate(
                [jnp.dot(ab[h], vvp_r[:, h * _DV:(h + 1) * _DV],
                         preferred_element_type=f32).astype(dt)
                 for h in range(H)], axis=-1))

    if not skip_p2n:
        a_all = jnp.concatenate(alpha_rows, axis=1)
        p2n_all = jax.lax.dot_general(
            a_all, z_ref[...].astype(dt), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).astype(dt)

    feats = []
    y_p2n = []
    rest_rows = wrest_ref.shape[0]
    for r in range(RT):
        o = outs[r]
        if fake_feat:
            if skip_p2n:
                y_p2n.append(jnp.zeros((L, wrest_ref.shape[1]), f32))
            else:
                acc = jnp.dot(p2n_all[:, r * H, :], wp2n_ref[0],
                              preferred_element_type=f32)
                for h in range(1, H):
                    acc = acc + jnp.dot(p2n_all[:, r * H + h, :],
                                        wp2n_ref[h],
                                        preferred_element_type=f32)
                y_p2n.append(acc)
            feats.append(jnp.concatenate(
                [o, o[:, :rest_rows - o.shape[1]]], axis=-1))
            continue
        node = jnp.concatenate(
            [o[:, h * _DV:h * _DV + V] for h in range(H)], axis=-1)
        pts_o = jnp.concatenate(
            [jnp.concatenate(
                [o[:, h * _DV + V + c * PV:h * _DV + V + (c + 1) * PV]
                 for h in range(H)], axis=-1) for c in range(3)], axis=-1)
        if skip_rot:
            fp = pts_o.astype(f32)
        else:
            fp = _rotate_sections(R[r * L:(r + 1) * L], t[r * L:(r + 1) * L],
                                  pts_o, HPV, transpose=True,
                                  sub_t=True).astype(f32)
        sumsq = (jnp.square(fp[:, :HPV]) + jnp.square(fp[:, HPV:2 * HPV])
                 + jnp.square(fp[:, 2 * HPV:]))
        dist = jnp.sqrt(sumsq + 1e-12)
        inv = 1.0 / (jnp.sqrt(sumsq + 1e-8) + 1e-4)
        direction = fp * jnp.concatenate([inv, inv, inv], axis=-1)
        if skip_p2n:
            y_p2n.append(jnp.zeros((L, wrest_ref.shape[1]), f32))
        else:
            acc = jnp.dot(p2n_all[:, r * H, :], wp2n_ref[0],
                          preferred_element_type=f32)
            for h in range(1, H):
                acc = acc + jnp.dot(p2n_all[:, r * H + h, :], wp2n_ref[h],
                                    preferred_element_type=f32)
            y_p2n.append(acc)
        feats.append(jnp.concatenate(
            [node, fp.astype(dt), dist.astype(dt), direction.astype(dt)],
            axis=-1))

    feat_rest = jnp.concatenate(feats, axis=0)
    y = (jnp.dot(feat_rest, wrest_ref[...], preferred_element_type=f32)
         + jnp.concatenate(y_p2n, axis=0) + bout_ref[...].astype(f32))
    y = y * mask_ref[...].reshape(rows, 1).astype(f32)

    x1 = _layernorm(x_in + y, ln1_ref[0].astype(f32), ln1_ref[1].astype(f32))
    if skip_mlp:
        out = x1
    else:
        h1 = jax.nn.relu(jnp.dot(x1.astype(dt), wm1_ref[...],
                                 preferred_element_type=f32)
                         + bm_ref[0].astype(f32))
        h2 = jax.nn.relu(jnp.dot(h1.astype(dt), wm2_ref[...],
                                 preferred_element_type=f32)
                         + bm_ref[1].astype(f32))
        h3 = (jnp.dot(h2.astype(dt), wm3_ref[...],
                      preferred_element_type=f32)
              + bm_ref[2].astype(f32))
        out = _layernorm(x1 + h3, ln2_ref[0].astype(f32),
                         ln2_ref[1].astype(f32))
    out_ref[...] = out.reshape(RT, L, -1).astype(out_ref.dtype)


if __name__ == '__main__':
    main()
