"""Pallas TPU kernels for the hot compute paths."""
from .ipa_pallas import fused_ipa_from_flat, ipa_attention_reference

__all__ = ['fused_ipa_from_flat', 'ipa_attention_reference']
