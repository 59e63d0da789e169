"""Host-side data layer (L1): PDB IO, preprocessing, transforms, collation."""
from .pdb import ParsingException, parse_pdb, pdb_chain_ids, save_pdb
from .structures import (
    preprocess_antibody_structure,
    label_heavy_chain_cdr,
    label_light_chain_cdr,
    label_whole_chain_as_cdr,
    aa_to_sequence,
)
from .transforms import (
    Compose,
    DISTVIOLATION,
    get_transform,
    register_transform,
    mask_select_data,
    generate_mask_from_contig,
    generate_random_mask,
)
from .collate import PaddingCollate, apply_patch_to_tensor, to_device_batch
from ._registry import get_dataset, register_dataset
from .loader import DataLoader, TransformedDataset, inf_iterator
from . import custom as _custom   # noqa: F401  (registers 'custom')
from . import sabdab as _sabdab   # noqa: F401  (registers 'sabdab')
from .sabdab import SAbDabDataset
from .custom import CustomDataset

__all__ = [k for k in dir() if not k.startswith('_')]
