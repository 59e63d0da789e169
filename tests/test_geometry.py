"""Unit + golden-parity tests for the L0 geometry/SO(3) layer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ab_opt_tpu import constants
from ab_opt_tpu import geometry as G


def random_rotations(rng, shape):
    q = rng.normal(size=shape + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(G.quaternion_to_rotation_matrix(jnp.asarray(q, jnp.float32)))


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        w = rng.normal(size=(64, 3)).astype(np.float32)
        # Keep angles strictly inside (0, pi) where the log is unique.
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.05, 3.0, (64, 1))
        R = G.so3vec_to_rotation(jnp.asarray(w))
        w2 = G.rotation_to_so3vec(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=2e-4)

    def test_rotation_validity(self, rng):
        w = rng.normal(size=(4, 7, 3)).astype(np.float32)
        R = np.asarray(G.so3vec_to_rotation(jnp.asarray(w)))
        eye = np.eye(3)
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.broadcast_to(eye, R.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_log_identity_is_zero(self):
        w = G.rotation_to_so3vec(jnp.eye(3)[None])
        np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-6)

    def test_log_gradients_finite(self, rng):
        R = jnp.asarray(random_rotations(rng, (8,)), jnp.float32)
        g = jax.grad(lambda R: jnp.sum(G.rotation_to_so3vec(R) ** 2))(R)
        assert np.isfinite(np.asarray(g)).all()
        # Near-identity and near-pi rotations must also be grad-safe.
        w = jnp.array([[1e-8, 0, 0], [np.pi - 1e-6, 0, 0]], jnp.float32)
        Rx = G.so3vec_to_rotation(w)
        g2 = jax.grad(lambda R: jnp.sum(G.rotation_to_so3vec(R) ** 2))(Rx)
        assert np.isfinite(np.asarray(g2)).all()

    def test_random_uniform_so3_shape(self):
        w = G.random_uniform_so3(jax.random.key(0), (5, 6))
        assert w.shape == (5, 6, 3)
        R = G.so3vec_to_rotation(w)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_quaternion_1ijk(self, rng):
        v = rng.normal(size=(10, 3)).astype(np.float32) * 0.3
        R = np.asarray(G.quaternion_1ijk_to_rotation_matrix(jnp.asarray(v)))
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                                   np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
        # Zero vector -> identity rotation.
        R0 = np.asarray(G.quaternion_1ijk_to_rotation_matrix(jnp.zeros((1, 3))))
        np.testing.assert_allclose(R0[0], np.eye(3), atol=1e-6)


class TestFrames:
    def test_basis_orthonormal(self, rng):
        center = rng.normal(size=(2, 5, 3)).astype(np.float32)
        p1 = center + rng.normal(size=(2, 5, 3)).astype(np.float32)
        p2 = center + rng.normal(size=(2, 5, 3)).astype(np.float32)
        R = np.asarray(G.construct_3d_basis(*map(jnp.asarray, (center, p1, p2))))
        np.testing.assert_allclose(np.swapaxes(R, -1, -2) @ R,
                                   np.broadcast_to(np.eye(3), R.shape), atol=1e-5)

    def test_local_global_roundtrip(self, rng):
        R = jnp.asarray(random_rotations(rng, (2, 5)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(2, 5, 3)), jnp.float32)
        p = jnp.asarray(rng.normal(size=(2, 5, 7, 3)), jnp.float32)
        q = G.local_to_global(R, t, p)
        p2 = G.global_to_local(R, t, q)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-5)

    def test_frame_equivariance(self, rng):
        """Distances between globally-mapped points are rotation invariant."""
        R = jnp.asarray(random_rotations(rng, (1, 4)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(1, 4, 3)), jnp.float32)
        p = jnp.asarray(rng.normal(size=(1, 4, 6, 3)), jnp.float32)
        q = G.local_to_global(R, t, p)

        R_glob = jnp.asarray(random_rotations(rng, ()), jnp.float32)
        t_glob = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
        R2, t2 = G.compose_rotation_and_translation(
            jnp.broadcast_to(R_glob, R.shape), jnp.broadcast_to(t_glob, t.shape), R, t)
        q2 = G.local_to_global(R2, t2, p)
        q_rot = jnp.einsum('ij,blkj->blki', R_glob, q) + t_glob
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q_rot), atol=1e-4)

    def test_compose_chain_matches_manual(self, rng):
        Rs = [jnp.asarray(random_rotations(rng, (3,)), jnp.float32) for _ in range(3)]
        ts = [jnp.asarray(rng.normal(size=(3, 3)), jnp.float32) for _ in range(3)]
        R, t = G.compose_chain(list(zip(Rs, ts)))
        R01, t01 = G.compose_rotation_and_translation(Rs[0], ts[0], Rs[1], ts[1])
        R_ref, t_ref = G.compose_rotation_and_translation(R01, t01, Rs[2], ts[2])
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), atol=1e-5)


class TestDihedrals:
    def test_against_independent_formula(self, rng):
        """Match the standard praxeolitic dihedral formula on random points."""
        pts = rng.normal(size=(50, 4, 3)).astype(np.float32)

        def ref_dihedral(p):
            b0, b1, b2 = p[0] - p[1], p[2] - p[1], p[3] - p[2]
            b1 = b1 / np.linalg.norm(b1)
            v = b0 - np.dot(b0, b1) * b1
            w = b2 - np.dot(b2, b1) * b1
            x = np.dot(v, w)
            y = np.dot(np.cross(b1, v), w)
            return np.arctan2(y, x)

        expect = np.array([ref_dihedral(p) for p in pts])
        got = np.asarray(G.dihedral_from_four_points(
            jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
            jnp.asarray(pts[:, 2]), jnp.asarray(pts[:, 3])))
        # Note the reference convention measures the dihedral with the sign
        # flipped relative to praxeolitic's: dihed(p0,p1,p2,p3) = -atan2 form.
        if not np.allclose(got, expect, atol=5e-3):
            np.testing.assert_allclose(got, -expect, atol=5e-3)

    def test_terminus_flags(self):
        chain_nb = jnp.array([[0, 0, 0, 1, 1]])
        res_nb = jnp.array([[1, 2, 3, 1, 2]])
        mask = jnp.ones((1, 5), bool)
        n_term, c_term = G.get_terminus_flag(chain_nb, res_nb, mask)
        np.testing.assert_array_equal(np.asarray(n_term[0]), [True, False, False, True, False])
        np.testing.assert_array_equal(np.asarray(c_term[0]), [False, False, True, False, True])


class TestBackbone:
    def test_reconstruct_idealized(self, rng):
        """Frames from reconstructed atoms reproduce the input frames."""
        B, L = 2, 6
        R = jnp.asarray(random_rotations(rng, (B, L)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(B, L, 3)) * 5, jnp.float32)
        aa = jnp.asarray(rng.integers(0, 20, (B, L)))
        chain_nb = jnp.zeros((B, L), jnp.int32)
        res_nb = jnp.broadcast_to(jnp.arange(1, L + 1), (B, L))
        mask = jnp.ones((B, L), bool)
        pos = G.reconstruct_backbone(R, t, aa, chain_nb, res_nb, mask)
        assert pos.shape == (B, L, 4, 3)
        # CA is placed at t.
        np.testing.assert_allclose(np.asarray(pos[:, :, 1]), np.asarray(t), atol=1e-5)
        R2 = G.construct_3d_basis(pos[:, :, 1], pos[:, :, 2], pos[:, :, 0])
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)

    def test_partial_keeps_context(self, rng):
        B, L, A = 1, 8, 15
        pos_ctx = jnp.asarray(rng.normal(size=(B, L, A, 3)), jnp.float32)
        mask_atoms = jnp.ones((B, L, A), bool)
        R = jnp.asarray(random_rotations(rng, (B, L)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(B, L, 3)), jnp.float32)
        aa = jnp.asarray(rng.integers(0, 20, (B, L)))
        recons = jnp.asarray([[False] * 4 + [True] * 2 + [False] * 2])
        pos_new, mask_new = G.reconstruct_backbone_partially(
            pos_ctx, R, t, aa, jnp.zeros((B, L), jnp.int32),
            jnp.broadcast_to(jnp.arange(1, L + 1), (B, L)), mask_atoms, recons)
        np.testing.assert_allclose(np.asarray(pos_new[0, :4]), np.asarray(pos_ctx[0, :4]))
        assert not np.allclose(np.asarray(pos_new[0, 4]), np.asarray(pos_ctx[0, 4]))
        # Rebuilt residues only expose 4 backbone atoms.
        np.testing.assert_array_equal(np.asarray(mask_new[0, 4]),
                                      np.arange(A) < 4)


class TestGoldenParity:
    """Bit-for-bit-ish comparison against the reference torch implementation."""

    def test_so3_parity(self, reference_abdock, rng):
        _, torch = reference_abdock
        from src.modules.common import so3 as ref_so3

        w = rng.normal(size=(32, 3)).astype(np.float32)
        R_ref = ref_so3.so3vec_to_rotation(torch.from_numpy(w)).numpy()
        R_jax = np.asarray(G.so3vec_to_rotation(jnp.asarray(w)))
        np.testing.assert_allclose(R_jax, R_ref, atol=1e-5)

        with torch.no_grad():
            w_ref = ref_so3.rotation_to_so3vec(torch.from_numpy(R_ref)).numpy()
        w_jax = np.asarray(G.rotation_to_so3vec(jnp.asarray(R_ref)))
        np.testing.assert_allclose(w_jax, w_ref, atol=2e-3)

    def test_geometry_parity(self, reference_abdock, rng):
        _, torch = reference_abdock
        from src.modules.common import geometry as ref_geo

        B, L, A = 2, 11, 15
        pos = rng.normal(size=(B, L, A, 3)).astype(np.float32) * 3
        tpos = torch.from_numpy(pos)
        R_ref = ref_geo.construct_3d_basis(tpos[:, :, 1], tpos[:, :, 2], tpos[:, :, 0])
        R_jax = G.construct_3d_basis(
            jnp.asarray(pos[:, :, 1]), jnp.asarray(pos[:, :, 2]), jnp.asarray(pos[:, :, 0]))
        np.testing.assert_allclose(np.asarray(R_jax), R_ref.numpy(), atol=1e-5)

        crd_ref = ref_geo.global_to_local(R_ref, tpos[:, :, 1], tpos).numpy()
        crd_jax = np.asarray(G.global_to_local(jnp.asarray(np.asarray(R_ref)),
                                               jnp.asarray(pos[:, :, 1]), jnp.asarray(pos)))
        np.testing.assert_allclose(crd_jax, crd_ref, atol=2e-4)

        chain_nb = torch.zeros(B, L, dtype=torch.long)
        res_nb = torch.arange(1, L + 1).repeat(B, 1)
        mask = torch.ones(B, L, dtype=torch.bool)
        dihed_ref, dmask_ref = ref_geo.get_backbone_dihedral_angles(tpos, chain_nb, res_nb, mask)
        dihed_jax, dmask_jax = G.get_backbone_dihedral_angles(
            jnp.asarray(pos), jnp.zeros((B, L), jnp.int32),
            jnp.broadcast_to(jnp.arange(1, L + 1), (B, L)), jnp.ones((B, L), bool))
        np.testing.assert_allclose(np.asarray(dihed_jax), dihed_ref.numpy(), atol=2e-3)
        np.testing.assert_array_equal(np.asarray(dmask_jax), dmask_ref.numpy())

        pd_ref = ref_geo.pairwise_dihedrals(tpos).numpy()
        pd_jax = np.asarray(G.pairwise_dihedrals(jnp.asarray(pos)))
        np.testing.assert_allclose(pd_jax, pd_ref, atol=2e-3)

    def test_reconstruct_backbone_parity(self, reference_abdock, rng):
        _, torch = reference_abdock
        from src.modules.common import geometry as ref_geo

        B, L = 2, 9
        R = random_rotations(rng, (B, L)).astype(np.float32)
        t = rng.normal(size=(B, L, 3)).astype(np.float32) * 4
        aa = rng.integers(0, 20, (B, L))
        chain_nb = np.zeros((B, L), np.int64)
        res_nb = np.broadcast_to(np.arange(1, L + 1), (B, L)).copy()
        mask = np.ones((B, L), bool)

        ref = ref_geo.reconstruct_backbone(
            torch.from_numpy(R), torch.from_numpy(t), torch.from_numpy(aa),
            torch.from_numpy(chain_nb), torch.from_numpy(res_nb), torch.from_numpy(mask),
        ).numpy()
        ours = np.asarray(G.reconstruct_backbone(
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(aa),
            jnp.asarray(chain_nb), jnp.asarray(res_nb), jnp.asarray(mask)))
        np.testing.assert_allclose(ours, ref, atol=5e-3)

    def test_constants_parity(self, reference_abdock):
        _, torch = reference_abdock
        from src.utils.protein import constants as ref_c

        np.testing.assert_allclose(
            constants.backbone_atom_coordinates,
            ref_c.backbone_atom_coordinates_tensor.numpy(), atol=1e-6)
        np.testing.assert_allclose(
            constants.bb_oxygen_coordinate,
            ref_c.bb_oxygen_coordinate_tensor.numpy(), atol=1e-6)
        for aa in range(20):
            assert (constants.restype_to_heavyatom_names[constants.AA(aa)]
                    == ref_c.restype_to_heavyatom_names[ref_c.AA(aa)])


def test_quaternion_compose_matches_matrix(rng):
    """quaternion_mul/so3vec<->quaternion reproduce matrix composition
    (the rotation transition's quaternion-space reverse step)."""
    from ab_opt_tpu.geometry import (quaternion_mul, quaternion_to_so3vec,
                                     rotation_to_so3vec, so3vec_to_quaternion,
                                     so3vec_to_rotation)
    a = jnp.asarray(rng.normal(size=(64, 3)) * 1.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(64, 3)) * 1.2, jnp.float32)
    ref = rotation_to_so3vec(
        jnp.matmul(so3vec_to_rotation(a), so3vec_to_rotation(b),
                   precision='highest'))
    got = quaternion_to_so3vec(
        quaternion_mul(so3vec_to_quaternion(a), so3vec_to_quaternion(b)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)
    # Round trip + zero rotation.
    zero = jnp.zeros((4, 3))
    np.testing.assert_allclose(
        np.asarray(quaternion_to_so3vec(so3vec_to_quaternion(zero))), 0.0)
