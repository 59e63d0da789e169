"""Neural encoder layers (L2): embeddings + invariant-point-attention encoder."""
from .layers import AngularEncoding, distance_to_bins_onehot, PerResiduePredictor
from .embeddings import ResidueEmbedding, PairEmbedding
from .ipa import GABlock, GAEncoder
from .epsilon_net import EpsilonNet
from .plddt import PerResidueLDDTCaPredictor, compute_plddt, lddt, lddt_loss
from . import inits

__all__ = [k for k in dir() if not k.startswith('_')]
