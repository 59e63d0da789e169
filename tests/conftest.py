"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set flags before jax initializes its backends, so this happens at
conftest import time (pytest imports conftest before test modules).
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms='axon,cpu' at interpreter
# startup; override it back to CPU for the test suite (8 virtual devices).
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = pathlib.Path('/root/reference')


@pytest.fixture(scope='session')
def reference_abdock():
    """Import the reference AbDock torch package for golden-parity checks.

    Skips if the reference checkout or torch is unavailable, so the test
    suite remains self-contained outside this build environment.
    """
    root = REFERENCE_ROOT / 'AbDock'
    if not root.exists():
        pytest.skip('reference checkout not available')
    torch = pytest.importorskip('torch')
    import sys
    if str(root) not in sys.path:
        sys.path.insert(0, str(root))
    return root, torch


# --------------------------------------------------------------------- tiers
# Auto-mark tests by module so `pytest -m unit` is a fast (<5 min) tier,
# `-m parity` the torch golden-parity tier, `-m e2e` the slow flows, and
# `-m nightly` the long tail (full config matrix, multi-process dryruns,
# overfit runs). Full CI = plain `pytest tests/` or `-m "e2e or nightly"`.
# A module-level `pytestmark` or per-test marker with one of these markers
# takes precedence over the module default.

_TIER_BY_MODULE = {
    'test_train': 'e2e', 'test_e2e_train_gnn': 'e2e', 'test_runner': 'e2e',
    'test_pipeline': 'e2e', 'test_parallel': 'e2e', 'test_configs': 'e2e',
    'test_diff_gnn': 'e2e', 'test_cli': 'e2e',
    # test_model exercises full loss/sample/optimize flows (slow compiles);
    # test_ipa_pallas is the kernel==module equivalence tier (interpret-mode
    # pallas on CPU is minutes) — both are too slow for the unit tier.
    'test_model': 'e2e', 'test_ipa_pallas': 'parity',
    'test_network_parity': 'parity', 'test_diffgnn_parity': 'parity',
    'test_checkpoint_convert': 'parity',
}
_TIERS = ('unit', 'parity', 'e2e', 'nightly')


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(m.name in _TIERS for m in item.iter_markers()):
            continue
        mod = item.module.__name__ if item.module else ''
        item.add_marker(getattr(pytest.mark, _TIER_BY_MODULE.get(mod, 'unit')))


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


_MINI_SABDAB_ROWS = [
    # pdb, H, L, ag_chain, ag_type, ag_name, date, resolution
    ('7dk2', 'A', 'B', 'C', 'protein', 'sars-cov-2 receptor binding domain',
     '01/01/21', '2.5'),
    ('5mes', 'H', 'L', 'A', 'protein', 'some antigen', '01/01/17', '3.0'),
    ('7bsd', 'A', 'B', 'G', 'protein', 'another antigen', '02/02/21', '2.0'),
]


@pytest.fixture(scope='session')
def mini_sabdab(tmp_path_factory):
    """Fabricated mini-SAbDab built from the reference's example chothia
    PDBs: a summary tsv + chothia dir that the real SAbDabDataset pipeline
    (parse -> pickle cache -> cluster -> split) runs against."""
    import shutil
    examples = REFERENCE_ROOT / 'AbDock' / 'data' / 'examples'
    if not examples.exists():
        pytest.skip('reference examples unavailable')
    src = {
        '7dk2': examples / '7DK2_AB_C_chothia.pdb',
        '5mes': examples / '5mes_H_L_A_chothia.pdb',
        '7bsd': examples / '7bsd_A_B_G_chothia.pdb',
    }
    root = tmp_path_factory.mktemp('sabdab')
    chothia = root / 'chothia'
    chothia.mkdir()
    for code, path in src.items():
        shutil.copy(path, chothia / f'{code}.pdb')
    header = ('pdb\tHchain\tLchain\tmodel\tantigen_chain\tantigen_type\t'
              'antigen_het_name\tantigen_name\tdate\tresolution\tmethod\tscfv\n')
    lines = [header]
    for pdb, h, l, ag, agt, agn, date, res in _MINI_SABDAB_ROWS:
        lines.append(f'{pdb}\t{h}\t{l}\t0\t{ag}\t{agt}\tNA\t{agn}\t{date}\t'
                     f'{res}\tX-RAY\tFalse\n')
    (root / 'summary.tsv').write_text(''.join(lines))
    return root
