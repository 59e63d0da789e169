"""Model wrappers (L4): registry + the diffab flagship model."""
from ._base import get_model, register_model
from .diffab import DiffAb, DiffAbConfig, DiffAbNet
from .diff_gnn import DiffGNN, DiffGNNConfig, DiffGNNNet
from . import losses

__all__ = ['get_model', 'register_model', 'DiffAb', 'DiffAbConfig',
           'DiffAbNet', 'DiffGNN', 'DiffGNNConfig', 'DiffGNNNet', 'losses']
