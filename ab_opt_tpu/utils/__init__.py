from .compile_cache import enable_compile_cache
from .config import ConfigDict, load_config
from .profiling import StepTimer, profile_trace, seed_all

__all__ = ['ConfigDict', 'load_config', 'StepTimer', 'profile_trace',
           'seed_all', 'enable_compile_cache']
