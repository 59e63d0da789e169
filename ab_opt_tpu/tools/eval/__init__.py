from .pipeline import EvalTask, EvalTaskScanner, evaluate_directory
from .similarity import eval_similarity, reslist_rmsd
from .energy import eval_interface_energy, pyrosetta_available

__all__ = ['EvalTask', 'EvalTaskScanner', 'evaluate_directory',
           'eval_similarity', 'reslist_rmsd', 'eval_interface_energy',
           'pyrosetta_available']
