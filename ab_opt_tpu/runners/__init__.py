"""Inference / pipeline runners (L5)."""
from .design import (
    BatchedSampler,
    DesignArgs,
    create_data_variants,
    design_for_pdb,
    find_cdrs,
    load_model_from_checkpoint,
)

__all__ = [k for k in dir() if not k.startswith('_')]
