"""Diffusion core (layer L3): variance schedules, IGSO(3) tables, and the
R^3 / SO(3) / categorical transition kernels as pure JAX functions.
"""
from .schedule import VarianceSchedule
from .igso3 import IGSO3Tables, build_igso3_tables, sample_igso3_angle, sample_igso3_vector
from .transitions import (
    PositionTransition,
    RotationTransition,
    SequenceTransition,
)

__all__ = [k for k in dir() if not k.startswith('_')]
