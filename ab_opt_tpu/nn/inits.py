"""AlphaFold-style parameter initializers (ref AbDock/src/modules/common/nn.py:99-161).

jax/flax equivalents of the reference's Linear init vocabulary, usable as
``kernel_init`` for any ``nn.Dense``:

  default  — lecun_normal (truncated)
  relu     — he_normal (truncated)
  glorot   — xavier_uniform
  gating   — zeros (bias ones handled by the caller)
  final    — zeros
  normal   — kaiming normal (fan_in)
"""
from __future__ import annotations

import flax.linen as nn

lecun_init = nn.initializers.variance_scaling(1.0, 'fan_in', 'truncated_normal')
relu_init = nn.initializers.variance_scaling(2.0, 'fan_in', 'truncated_normal')
glorot_init = nn.initializers.xavier_uniform()
gating_init = nn.initializers.zeros
final_init = nn.initializers.zeros
normal_init = nn.initializers.variance_scaling(2.0, 'fan_in', 'normal')

INIT_BY_NAME = {
    'default': lecun_init,
    'relu': relu_init,
    'glorot': glorot_init,
    'gating': gating_init,
    'final': final_init,
    'normal': normal_init,
}
