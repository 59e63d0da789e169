"""Tests for the external-tool layer: relax scanner, eval pipeline,
similarity DP, renumber fallback, hdock gating."""
import json
import pathlib

import numpy as np
import pytest

from ab_opt_tpu.tools.relax import RelaxTask, TaskScanner, available_backends
from ab_opt_tpu.tools.eval import EvalTaskScanner, evaluate_directory
from ab_opt_tpu.tools.eval.similarity import reslist_rmsd, eval_similarity
from ab_opt_tpu.tools.renumber import renumber_antibody
from ab_opt_tpu.tools.hdock import hdock_available

EXAMPLES = pathlib.Path('/root/reference/AbDock/data/examples')


class TestRelaxScanner:
    def test_scan_and_skip_finished(self, tmp_path):
        d = tmp_path / 'H_CDR3'
        d.mkdir()
        (d / '0000.pdb').write_text('ATOM\n')
        (d / '0001.pdb').write_text('ATOM\n')
        (d / '0001_rosetta.pdb').write_text('ATOM\n')   # finished
        (d / '0002_patch.pdb').write_text('ATOM\n')     # excluded (patch)
        (d / 'REF1.pdb').write_text('ATOM\n')
        (d / 'empty.pdb').write_text('')
        meta = {'items': [{'tag': 'H_CDR3', 'residue_first': ['A', 95, ' '],
                           'residue_last': ['A', 102, ' ']}]}
        (tmp_path / 'metadata.json').write_text(json.dumps(meta))

        scanner = TaskScanner(str(tmp_path), final_postfix='rosetta')
        tasks = scanner.scan()
        names = sorted(pathlib.Path(t.in_path).name for t in tasks)
        assert names == ['0000.pdb', 'REF1.pdb']
        assert tasks[0].flexible_residue_first == ['A', 95, ' ']
        # Re-scan skips visited.
        assert scanner.scan() == []

    def test_task_state_machine(self, tmp_path):
        p = tmp_path / '0000.pdb'
        p.write_text('ATOM\n')
        t = RelaxTask(in_path=str(p), current_path=str(p), info={})
        assert t.can_proceed()
        assert t.path_with_tag('openmm').endswith('0000_openmm.pdb')
        assert not t.update_if_finished('openmm')
        (tmp_path / '0000_openmm.pdb').write_text('ATOM\n')
        assert t.update_if_finished('openmm')
        assert t.status == 'success'
        assert t.current_path.endswith('_openmm.pdb')

    def test_backends_report(self):
        b = available_backends()
        assert set(b) == {'openmm', 'pyrosetta'}


class TestSimilarity:
    def test_reslist_rmsd_identical(self, rng):
        ca = rng.normal(size=(10, 3)).astype(np.float32)
        assert reslist_rmsd(ca, ca) < 1e-6

    def test_reslist_rmsd_subwindow(self, rng):
        long = rng.normal(size=(12, 3)).astype(np.float32) * 10
        short = long[3:9]
        assert reslist_rmsd(short, long) < 1e-6
        # Perturbed window has nonzero rmsd.
        assert reslist_rmsd(short + 1.0, long) > 0.5

    @pytest.mark.skipif(not EXAMPLES.exists(), reason='examples unavailable')
    def test_eval_similarity_paths(self, tmp_path):
        src = str(EXAMPLES / '7DK2_AB_C.pdb')
        res = eval_similarity(src, src)
        assert res['rmsd'] < 1e-6
        assert res['seqid'] == pytest.approx(1.0)


class TestEvalPipeline:
    @pytest.mark.skipif(not EXAMPLES.exists(), reason='examples unavailable')
    def test_evaluate_directory(self, tmp_path):
        import shutil
        d = tmp_path / 'method' / 'results' / 'H_CDR3'
        d.mkdir(parents=True)
        src = EXAMPLES / '3QHF_Fv.pdb'
        shutil.copy(src, d / '0000.pdb')
        shutil.copy(src, d / 'REF1.pdb')
        df = evaluate_directory(str(tmp_path))
        assert len(df) == 1
        assert df.iloc[0]['rmsd'] < 1e-6
        # Second run: db remembers visited tasks, summary still written.
        df2 = evaluate_directory(str(tmp_path))
        assert len(df2) == 1


class TestRenumber:
    @pytest.mark.skipif(not EXAMPLES.exists(), reason='examples unavailable')
    def test_passthrough_on_chothia(self, tmp_path):
        src = str(EXAMPLES / '7DK2_AB_C_chothia.pdb')
        out = tmp_path / 'out.pdb'
        path, heavy, light = renumber_antibody(src, str(out))
        assert out.exists()
        assert heavy == ['A']
        assert light == ['B']

    def test_raises_on_non_antibody(self, tmp_path):
        from ab_opt_tpu.tools.renumber import abnumber_available
        if abnumber_available():
            pytest.skip('abnumber installed; fallback not used')
        src = EXAMPLES / 'Omicron_RBD.pdb'
        if not src.exists():
            pytest.skip('examples unavailable')
        with pytest.raises(RuntimeError):
            renumber_antibody(str(src), str(tmp_path / 'o.pdb'))


def test_hdock_gating():
    if hdock_available():
        pytest.skip('hdock installed')
    from ab_opt_tpu.tools.hdock import HDockAntibody
    with pytest.raises(RuntimeError):
        HDockAntibody()


def test_screening_analysis(tmp_path):
    """Analysis walkthrough (examples/ab_opt_analysis.py): screening_df,
    sequence logo, quantile filter (ref ab_opt.ipynb cells 4-10)."""
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                           / 'examples'))
    import ab_opt_analysis as A

    rng = np.random.default_rng(0)
    for i in range(4):
        d = tmp_path / f'cand{i}' 
        d.mkdir()
        dockq = [round(float(x), 3) for x in rng.uniform(0.2, 0.8, 5)]
        prmsd = [round(float(x), 3) for x in rng.uniform(2, 9, 5)]
        (d / 'results.csv').write_text(
            ',DockQ_mean,DockQ_std,prmsd_mean,prmsd_std,AAR_mean,'
            'DockQ_all,prmsd_all\n'
            f'H_CDR3,{np.mean(dockq):.3f},{np.std(dockq):.3f},'
            f'{np.mean(prmsd):.3f},{np.std(prmsd):.3f},0.4,'
            f'"{dockq}","{prmsd}"\n')
        (d / 'aa.csv').write_text(
            'Region,native_aa,sampled_aa,AAR,PPL\n'
            f'H_CDR3,YCARDLGI,{"ACDEFGHI" if i % 2 else "YCARDLGI"},0.5,0.1\n')

    df = A.main(['--screen_dir', str(tmp_path)])
    assert len(df) == 4
    assert np.isfinite(df['DockQ_avg']).all()
    out = tmp_path / 'analysis'
    assert (out / 'screening_df.csv').exists()
    assert (out / 'sequence_logo.csv').exists()
    assert (out / 'sequence_logo.png').exists()
    assert (out / 'screening_distributions.png').exists()
    assert (out / 'mutation_candidates.csv').exists()
    counts = A.aa_counts(df['aa'])
    assert counts.shape == (8, 20) and counts.sum() == 32


def test_seq_design_summary(tmp_path):
    """Stage-1 per-candidate AAR summary (examples/ab_opt_analysis.py
    summarize_seq_design; ref optimize_ab.py:42 summarize_seqs): mean AAR per
    candidate from aa.csv, sorted ascending (most-mutated first)."""
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                           / 'examples'))
    import ab_opt_analysis as A

    aars = {'candA': [0.8, 0.6], 'candB': [0.2, 0.4], 'candC': [0.5]}
    for name, vals in aars.items():
        d = tmp_path / name
        d.mkdir()
        lines = ['Region,native_aa,sampled_aa,AAR,PPL'] + [
            f'H_CDR3,YCARDLGI,ACDEFGHI,{v},0.1' for v in vals]
        (d / 'aa.csv').write_text('\n'.join(lines) + '\n')
    (tmp_path / 'no_csv_dir').mkdir()  # ignored: no aa.csv

    df = A.summarize_seq_design(str(tmp_path))
    assert list(df['pdb_id']) == ['candB', 'candC', 'candA']  # ascending AAR
    assert np.allclose(df['AAR'], [0.3, 0.5, 0.7])
    assert list(df['id']) == [0, 1, 2]
    assert (tmp_path / 'summary.csv').exists()
