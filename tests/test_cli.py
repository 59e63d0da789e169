"""Thin-CLI smoke tests: every entry script imports and prints --help."""
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

CLIS = ['train.py', 'dock_pdb.py', 'design_pdb.py', 'dock_testset.py',
        'design_testset.py', 'optimize_ab.py', 'design_dock.py',
        'run_relax.py', 'eval.py']


@pytest.mark.parametrize('script', CLIS)
def test_cli_help(script):
    out = subprocess.run(
        [sys.executable, str(REPO / script), '--help'],
        capture_output=True, text=True, timeout=240,
        env={'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin:/usr/local/bin',
             'HOME': '/root', 'PYTHONPATH': str(REPO)})
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'usage' in out.stdout.lower()


def test_examples_pipeline_help():
    out = subprocess.run(
        [sys.executable, str(REPO / 'examples' / 'ab_opt_pipeline.py'),
         '--help'],
        capture_output=True, text=True, timeout=240,
        env={'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin:/usr/local/bin',
             'HOME': '/root', 'PYTHONPATH': str(REPO)})
    assert out.returncode == 0, out.stderr[-2000:]
