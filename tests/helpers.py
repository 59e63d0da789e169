"""Shared test utilities: synthetic batches resembling cropped complexes."""
from ab_opt_tpu.utils.bench_fixture import synthetic_batch as make_batch

__all__ = ['make_batch']
