"""External-tool layer (L6): DockQ, relax, eval, renumber, HDock.

Heavy third-party backends (OpenMM, PyRosetta, AbNumber, hdock) are
license-gated optional plug-ins: modules import cleanly without them and
raise informative errors when invoked.
"""
from . import dockq  # noqa: F401

__all__ = ['dockq']
