from .config import ConfigDict, load_config

__all__ = ['ConfigDict', 'load_config']
