"""Model registry (ref AbDock/src/models/_base.py)."""
from __future__ import annotations

_MODEL_DICT = {}


def register_model(name: str):
    def decorator(cls):
        _MODEL_DICT[name] = cls
        return cls
    return decorator


def get_model(cfg):
    """Build a model from a config dict with a 'type' key."""
    cfg = dict(cfg)
    model_type = cfg.pop('type')
    return _MODEL_DICT[model_type](cfg)
