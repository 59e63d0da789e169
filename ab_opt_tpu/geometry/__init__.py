"""Pure-JAX rigid-frame / SO(3) geometry (layer L0).

Everything here is shape-static, differentiable, vmappable jnp code with no
parameters — the TPU-native analog of the reference's
``AbDock/src/modules/common/{geometry,so3,topology}.py``.
"""
from .vec import (
    normalize_vector,
    project_v2v,
    safe_norm,
    pairwise_distances,
    angstrom_to_nm,
    nm_to_angstrom,
)
from .so3 import (
    so3vec_to_skewsym,
    skewsym_to_so3vec,
    exp_skewsym,
    log_rotation,
    so3vec_to_rotation,
    rotation_to_so3vec,
    planar_from_matrix,
    planar_to_matrix,
    so3vec_to_rotation_planar,
    planar_rotation_to_so3vec,
    quaternion_1ijk_to_rotation_planar,
    planar_compose,
    planar_apply_to_vector,
    random_uniform_so3,
    quaternion_to_rotation_matrix,
    quaternion_1ijk_to_rotation_matrix,
    so3vec_to_quaternion,
    quaternion_mul,
    quaternion_to_so3vec,
)
from .frames import (
    construct_3d_basis,
    local_to_global,
    global_to_local,
    apply_rotation_to_vector,
    compose_rotation_and_translation,
    compose_chain,
    repr_6d_to_rotation_matrix,
)
from .dihedrals import (
    dihedral_from_four_points,
    get_consecutive_flag,
    get_terminus_flag,
    get_backbone_dihedral_angles,
    pairwise_dihedrals,
)
from .backbone import (
    reconstruct_backbone,
    reconstruct_backbone_partially,
)

__all__ = [k for k in dir() if not k.startswith('_')]
