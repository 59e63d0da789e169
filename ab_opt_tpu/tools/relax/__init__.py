from .base import (
    RelaxTask,
    TaskScanner,
    available_backends,
    relax_directory,
    run_pipeline,
)

__all__ = ['RelaxTask', 'TaskScanner', 'available_backends',
           'relax_directory', 'run_pipeline']
