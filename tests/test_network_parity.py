"""Golden-parity of the neural network vs the torch reference.

Initializes the reference torch modules, converts their weights with
ab_opt_tpu.utils.torch_convert, and compares forward outputs on identical
inputs. This pins down head reshape orders, masking semantics, and the IPA
attention math.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ab_opt_tpu.nn import EpsilonNet, PairEmbedding, ResidueEmbedding
from ab_opt_tpu.utils import torch_convert as tc
from helpers import make_batch

F_RES, F_PAIR, N_LAYERS = 16, 8, 2
NUM_ATOMS, NUM_BINS = 15, 8


@pytest.fixture(scope='module')
def batch():
    return make_batch(np.random.default_rng(7), N=2, L=16)


def _ctx_masks(batch):
    ctx = np.asarray(batch['mask_heavyatom'][:, :, 1]) & ~np.asarray(batch['generate_flag'])
    return jnp.asarray(ctx)


class TestEncoderParity:
    def test_residue_embedding(self, reference_abdock, batch):
        _, torch = reference_abdock
        from src.modules.encoders.residue import ResidueEmbedding as RefRes
        torch.manual_seed(0)
        ref = RefRes(F_RES, NUM_ATOMS).eval()
        params = {'params': tc.convert_residue_embed(
            {f'residue_embed.{k}': v for k, v in ref.state_dict().items()})}

        ctx = _ctx_masks(batch)
        t = lambda k: torch.from_numpy(np.asarray(batch[k]))
        with torch.no_grad():
            out_ref = ref(
                aa=t('aa'), res_nb=t('res_nb'), chain_nb=t('chain_nb'),
                pos_atoms=t('pos_heavyatom'), mask_atoms=t('mask_heavyatom'),
                fragment_type=t('fragment_type'),
                structure_mask=torch.from_numpy(np.asarray(ctx)),
                sequence_mask=torch.from_numpy(np.asarray(ctx))).numpy()

        model = ResidueEmbedding(F_RES, NUM_ATOMS)
        out = model.apply({'params': params['params']},
                          batch['aa'], batch['res_nb'], batch['chain_nb'],
                          batch['pos_heavyatom'], batch['mask_heavyatom'],
                          batch['fragment_type'], ctx, ctx)
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-4)

    def test_pair_embedding(self, reference_abdock, batch):
        _, torch = reference_abdock
        from src.modules.encoders.pair import PairEmbedding as RefPair
        torch.manual_seed(0)
        ref = RefPair(F_PAIR, NUM_ATOMS).eval()
        params = {'params': tc.convert_pair_embed(
            {f'pair_embed.{k}': v for k, v in ref.state_dict().items()})}

        ctx = _ctx_masks(batch)
        t = lambda k: torch.from_numpy(np.asarray(batch[k]))
        with torch.no_grad():
            out_ref = ref(
                aa=t('aa'), res_nb=t('res_nb'), chain_nb=t('chain_nb'),
                pos_atoms=t('pos_heavyatom'), mask_atoms=t('mask_heavyatom'),
                structure_mask=torch.from_numpy(np.asarray(ctx)),
                sequence_mask=torch.from_numpy(np.asarray(ctx))).numpy()

        model = PairEmbedding(F_PAIR, NUM_ATOMS)
        out = model.apply(params, batch['aa'], batch['res_nb'], batch['chain_nb'],
                          batch['pos_heavyatom'], batch['mask_heavyatom'],
                          ctx, ctx)
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-4)

    def test_epsilon_net(self, reference_abdock, batch):
        _, torch = reference_abdock
        from src.modules.diffusion.dpm_full import EpsilonNet as RefEps
        torch.manual_seed(1)
        ref = RefEps(F_RES, F_PAIR, num_layers=N_LAYERS, no_bins=NUM_BINS).eval()
        params = {'params': tc.convert_eps_net(
            {f'diffusion.eps_net.{k}': v for k, v in ref.state_dict().items()},
            num_layers=N_LAYERS)}

        rng = np.random.default_rng(3)
        N, L = np.asarray(batch['aa']).shape
        v_t = (rng.normal(size=(N, L, 3)) * 0.8).astype(np.float32)
        p_t = rng.normal(size=(N, L, 3)).astype(np.float32)
        s_t = np.asarray(batch['aa'])
        res_feat = rng.normal(size=(N, L, F_RES)).astype(np.float32)
        pair_feat = rng.normal(size=(N, L, L, F_PAIR)).astype(np.float32)
        beta = np.asarray([0.1, 0.7], np.float32)
        mask_gen = np.asarray(batch['generate_flag'])
        mask_res = np.asarray(batch['mask'])

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(v_t), torch.from_numpy(p_t),
                          torch.from_numpy(s_t), torch.from_numpy(res_feat),
                          torch.from_numpy(pair_feat), torch.from_numpy(beta),
                          torch.from_numpy(mask_gen), torch.from_numpy(mask_res))
        v_ref, R_ref, eps_pos_ref, c_ref, prmsd_ref = [x.numpy() for x in ref_out]

        model = EpsilonNet(F_RES, F_PAIR, N_LAYERS, num_bins=NUM_BINS)
        v_j, R_j, eps_pos_j, c_j, prmsd_j = model.apply(
            params, jnp.asarray(v_t), jnp.asarray(p_t), jnp.asarray(s_t),
            jnp.asarray(res_feat), jnp.asarray(pair_feat), jnp.asarray(beta),
            jnp.asarray(mask_gen), jnp.asarray(mask_res))

        np.testing.assert_allclose(np.asarray(R_j), R_ref, atol=5e-4)
        np.testing.assert_allclose(np.asarray(eps_pos_j), eps_pos_ref, atol=5e-4)
        np.testing.assert_allclose(np.asarray(c_j), c_ref, atol=5e-4)
        np.testing.assert_allclose(np.asarray(prmsd_j), prmsd_ref, atol=5e-4)
        # v (so3vec of R) can differ more near the acos clamp; compare loosely.
        np.testing.assert_allclose(np.asarray(v_j), v_ref, atol=5e-3)


class TestLossParity:
    def test_rotation_cosine_loss(self, reference_abdock, rng):
        _, torch = reference_abdock
        from src.modules.diffusion.dpm_full import rotation_matrix_cosine_loss
        from ab_opt_tpu.models.losses import rotation_matrix_cosine_loss as ours
        A = rng.normal(size=(4, 6, 3, 3)).astype(np.float32)
        B = rng.normal(size=(4, 6, 3, 3)).astype(np.float32)
        ref = rotation_matrix_cosine_loss(torch.from_numpy(A), torch.from_numpy(B)).numpy()
        got = np.asarray(ours(jnp.asarray(A), jnp.asarray(B)))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_dist_loss(self, reference_abdock, rng):
        _, torch = reference_abdock
        from src.modules.diffusion.dpm_full import calc_dist_loss
        from ab_opt_tpu.models.losses import pairwise_distance_loss
        p1 = rng.normal(size=(2, 10, 3)).astype(np.float32)
        p2 = rng.normal(size=(2, 10, 3)).astype(np.float32)
        mg = rng.random((2, 10)) < 0.4
        mr = np.ones((2, 10), bool)
        ref = calc_dist_loss(torch.from_numpy(p1), torch.from_numpy(p2),
                             torch.from_numpy(mg), torch.from_numpy(mr)).numpy()
        got = np.asarray(pairwise_distance_loss(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(mg), jnp.asarray(mr)))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_prmsd_head_parity(self, reference_abdock, rng):
        _, torch = reference_abdock
        from src.modules.common.prmsd import pRMSDCa
        from ab_opt_tpu.models.losses import compute_prmsd, masked_rmsd, prmsd_loss
        head = pRMSDCa(NUM_BINS, dist_min=0.5, dist_max=19.5)
        logits = rng.normal(size=(4, NUM_BINS)).astype(np.float32)
        ref_score = head.compute_prmsd(torch.from_numpy(logits)).numpy()
        got_score = np.asarray(compute_prmsd(jnp.asarray(logits), 0.5, 19.5))
        np.testing.assert_allclose(got_score, ref_score, atol=1e-5)

        pred = rng.normal(size=(4, 10, 3)).astype(np.float32)
        tgt = rng.normal(size=(4, 10, 3)).astype(np.float32)
        mask = (rng.random((4, 10)) < 0.5)
        mask[:, 0] = True
        ref_rmsd = head.calc_rmsd(torch.from_numpy(pred), torch.from_numpy(tgt),
                                  torch.from_numpy(mask)).numpy()
        got_rmsd = np.asarray(masked_rmsd(jnp.asarray(pred), jnp.asarray(tgt),
                                          jnp.asarray(mask)))
        np.testing.assert_allclose(got_rmsd, ref_rmsd, atol=1e-4)

        cmask = np.ones((4,), bool)
        ref_loss = head(torch.from_numpy(logits), torch.from_numpy(ref_rmsd),
                        torch.from_numpy(cmask)).numpy()
        got_loss = np.asarray(prmsd_loss(jnp.asarray(logits), jnp.asarray(got_rmsd),
                                         jnp.asarray(cmask), 0.5, 19.5, NUM_BINS))
        np.testing.assert_allclose(got_loss, ref_loss, atol=1e-4)

    def test_perplexity_parity(self, reference_abdock, rng):
        _, torch = reference_abdock
        from src.modules.diffusion.dpm_full import calc_perplexity
        from ab_opt_tpu.models.losses import sequence_perplexity
        logits = rng.random((3, 8, 20)).astype(np.float32)
        mask = rng.random((3, 8)) < 0.6
        ref = calc_perplexity(torch.from_numpy(logits), torch.from_numpy(mask)).numpy()
        got = np.asarray(sequence_perplexity(jnp.asarray(logits), jnp.asarray(mask)))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestProductionDimsParity:
    def test_epsilon_net_production_config(self, reference_abdock, batch):
        """Converted-weight forward parity at the real 6-layer 128/64 dims."""
        _, torch = reference_abdock
        from src.modules.diffusion.dpm_full import EpsilonNet as RefEps
        F, C, LAYERS, BINS = 128, 64, 6, 40
        torch.manual_seed(7)
        ref = RefEps(F, C, num_layers=LAYERS, no_bins=BINS).eval()
        params = {'params': tc.convert_eps_net(
            {f'diffusion.eps_net.{k}': v for k, v in ref.state_dict().items()},
            num_layers=LAYERS)}

        rng = np.random.default_rng(11)
        N, L = 1, 24
        v_t = (rng.normal(size=(N, L, 3)) * 0.8).astype(np.float32)
        p_t = rng.normal(size=(N, L, 3)).astype(np.float32)
        s_t = rng.integers(0, 20, (N, L))
        res_feat = rng.normal(size=(N, L, F)).astype(np.float32)
        pair_feat = (rng.normal(size=(N, L, L, C)) * 0.3).astype(np.float32)
        beta = np.asarray([0.4], np.float32)
        mask_gen = np.zeros((N, L), bool); mask_gen[:, 8:16] = True
        mask_res = np.ones((N, L), bool)

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(v_t), torch.from_numpy(p_t),
                          torch.from_numpy(s_t), torch.from_numpy(res_feat),
                          torch.from_numpy(pair_feat), torch.from_numpy(beta),
                          torch.from_numpy(mask_gen), torch.from_numpy(mask_res))
        model = EpsilonNet(F, C, LAYERS, num_bins=BINS)
        got = model.apply(params, jnp.asarray(v_t), jnp.asarray(p_t),
                          jnp.asarray(s_t), jnp.asarray(res_feat),
                          jnp.asarray(pair_feat), jnp.asarray(beta),
                          jnp.asarray(mask_gen), jnp.asarray(mask_res))
        names = ('v', 'R', 'eps_pos', 'c', 'prmsd')
        for g, r, name in zip(got, ref_out, names):
            tol = 5e-3 if name == 'v' else 1e-3
            np.testing.assert_allclose(np.asarray(g), r.numpy(), atol=tol,
                                       err_msg=name)
