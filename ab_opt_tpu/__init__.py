"""ab_opt_tpu — a TPU-native JAX framework for antibody design, docking, and
optimization, providing the capabilities of pengzhangzhi/ab_opt (AbDesign +
AbDock) re-designed for jit/vmap/pjit/pallas over device meshes.
"""

__version__ = '0.1.0'
