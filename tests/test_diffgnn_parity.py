"""Golden network parity: reference MCAttEGNN/SeqGNN (torch, flattened graph
+ torch_scatter) vs the dense-masked rewrite (DenseMCAttEGNN/DenseSeqGNN),
through the checkpoint converter (utils/torch_convert.py).

torch_scatter is not installed in this environment; a pure-torch shim
provides the single function the reference uses (scatter_softmax).
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = '/root/reference/AbDesign'

F_IN, HID, EDGE, C, L = 12, 16, 8, 3, 20


def _install_torch_scatter_shim(torch):
    if 'torch_scatter' in sys.modules:
        return
    mod = types.ModuleType('torch_scatter')

    def scatter_softmax(src, index, dim=0):
        out = torch.zeros_like(src)
        for g in index.unique():
            m = index == g
            out[m] = torch.softmax(src[m], dim=0)
        return out

    def scatter_sum(src, index, dim=0, dim_size=None):
        n = int(dim_size if dim_size is not None else index.max() + 1)
        shape = list(src.shape)
        shape[dim] = n
        out = src.new_zeros(shape)
        idx = index
        for _ in range(src.dim() - 1):
            idx = idx.unsqueeze(-1)
        return out.scatter_add_(dim, idx.expand_as(src), src)

    def scatter_mean(src, index, dim=0, dim_size=None):
        s = scatter_sum(src, index, dim, dim_size)
        c = scatter_sum(torch.ones_like(src), index, dim, dim_size)
        return s / c.clamp(min=1)

    mod.scatter_softmax = scatter_softmax
    mod.scatter_sum = scatter_sum
    mod.scatter_mean = scatter_mean
    sys.modules['torch_scatter'] = mod


def _install_bio_shim():
    """The MCAttGNN package __init__ pulls in pdb_utils, which imports
    Biopython (absent here); only the names need to exist — the parity path
    never touches them."""
    if 'Bio' in sys.modules:
        return
    bio = types.ModuleType('Bio')
    pdb = types.ModuleType('Bio.PDB')
    for cls in ('PDBParser', 'PDBIO'):
        setattr(pdb, cls, type(cls, (), {}))
    bio.PDB = pdb
    sys.modules['Bio'] = bio
    sys.modules['Bio.PDB'] = pdb
    for sub in ('Structure', 'Model', 'Chain', 'Residue', 'Atom'):
        m = types.ModuleType(f'Bio.PDB.{sub}')
        setattr(m, sub, type(sub, (), {}))
        sys.modules[f'Bio.PDB.{sub}'] = m
        setattr(pdb, sub, m)


@pytest.fixture(scope='module')
def ref_modules():
    torch = pytest.importorskip('torch')
    _install_torch_scatter_shim(torch)
    _install_bio_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from diffab.modules.MCAttGNN.mc_egnn import MCAttEGNN, SeqGNN
    return torch, MCAttEGNN, SeqGNN


def _graph(rng):
    """A small two-segment complex with radial ctx/inter adjacency."""
    from ab_opt_tpu.nn.egnn import build_adjacency
    coords = np.cumsum(rng.normal(scale=1.5, size=(1, L, C, 3)), axis=1)
    coords = coords.astype(np.float32)
    frag = np.where(np.arange(L) < L // 2, 1, 3)[None]
    mask = np.ones((1, L), bool)
    ctx, inter = build_adjacency(jnp.asarray(coords[:, :, 1]),
                                 jnp.asarray(frag), jnp.asarray(mask),
                                 ctx_cutoff=6.0, inter_cutoff=9.0)
    return coords, np.asarray(ctx), np.asarray(inter)


def _edges(adj):
    rows, cols = np.nonzero(adj[0])
    return rows, cols


class TestDiffGNNParity:
    def test_mcatt_egnn_and_seqgnn(self, ref_modules, rng):
        torch, MCAttEGNN, SeqGNN = ref_modules
        torch.manual_seed(0)

        gnn_t = MCAttEGNN(F_IN, HID, HID, C, EDGE, n_layers=2,
                          residual=True, dropout=0.0).eval()
        seq_t = SeqGNN(HID, HID, 21, C, 0, dropout=0.0).eval()

        coords, ctx, inter = _graph(rng)
        assert ctx.sum() > 10 and inter.sum() > 10
        h = rng.normal(size=(1, L, F_IN)).astype(np.float32)
        eattr = rng.normal(size=(1, L, L, EDGE)).astype(np.float32)
        eattr = eattr * ctx[..., None]
        cond = rng.uniform(size=(1, L)).astype(np.float32)
        hyd = rng.integers(1, 4, (1, L))
        chg = rng.integers(1, 4, (1, L))

        # ---- reference forward (flattened graph) -------------------------
        crow, ccol = _edges(ctx)
        irow, icol = _edges(inter)
        with torch.no_grad():
            h_t, x_t = gnn_t(
                torch.from_numpy(h[0]),
                torch.from_numpy(coords[0]),
                [torch.from_numpy(crow), torch.from_numpy(ccol)],
                [torch.from_numpy(irow), torch.from_numpy(icol)],
                torch.from_numpy(cond[0]),
                class_condition=None, hydropathy=None, charge=None,
                ctx_edge_attr=torch.from_numpy(eattr[0, crow, ccol]))
            logits_t = seq_t(
                h_t,
                [torch.from_numpy(irow), torch.from_numpy(icol)],
                x_t, None,
                torch.from_numpy(hyd[0]), torch.from_numpy(chg[0]))

        # ---- dense rewrite with converted weights -------------------------
        from ab_opt_tpu.nn.egnn import DenseMCAttEGNN, DenseSeqGNN
        from ab_opt_tpu.utils.torch_convert import (convert_mcatt_egnn,
                                                    convert_seqgnn)
        sd = {f'gnn.{k}': v for k, v in gnn_t.state_dict().items()}
        sd |= {f'seqgnn.{k}': v for k, v in seq_t.state_dict().items()}

        gnn_j = DenseMCAttEGNN(hidden_nf=HID, out_node_nf=HID, n_channel=C,
                               in_edge_nf=EDGE, n_layers=2, dropout=0.0)
        seq_j = DenseSeqGNN(HID, C, out_node_nf=21, dropout=0.0)

        gp = {'params': convert_mcatt_egnn(sd, 2, HID, C, EDGE)}
        sp = {'params': convert_seqgnn(sd, HID, C)}

        out, z, hidden = gnn_j.apply(
            gp, jnp.asarray(h), jnp.asarray(coords), jnp.asarray(ctx),
            jnp.asarray(inter), jnp.asarray(cond), jnp.asarray(eattr), True)
        logits_j = seq_j.apply(sp, out, z, jnp.asarray(inter),
                               jnp.asarray(hyd), jnp.asarray(chg), True)

        np.testing.assert_allclose(np.asarray(out[0]), h_t.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(z[0]), x_t.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(logits_j[0]), logits_t.numpy(),
                                   atol=2e-4, rtol=1e-3)
