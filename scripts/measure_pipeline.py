"""Measure host input-pipeline throughput at production dims.

The question (VERDICT r2 weak #6): can the host-side transform pipeline
(mask -> merge -> PatchAroundAnchor crop -> PaddingCollate) feed the chip at
its measured production-dims training rate (89.5 samples/s, PERF.md), and
what fraction of step time does the pipeline add when overlapped?

Runs the exact training transform stack from scripts/validation_train.py on
the bundled real complexes and reports items/s for num_workers in {0, 4, 8},
plus the implied overhead: with the loader's prefetch thread the pipeline
overlaps compute, so overhead ~= max(0, chip_rate / host_rate - 1) if the
host is slower, else ~0.

Usage: python scripts/measure_pipeline.py [--seconds 20] [--chip-rate 89.5]
"""
import argparse
import itertools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

EXAMPLES = '/root/reference/AbDock/data/examples'
COMPLEXES = [
    ('7DK2', f'{EXAMPLES}/7DK2_AB_C_chothia.pdb', 'A', 'B'),
    ('5mes', f'{EXAMPLES}/5mes_H_L_A_chothia.pdb', 'H', 'L'),
    ('7bsd', f'{EXAMPLES}/7bsd_A_B_G_chothia.pdb', 'A', 'B'),
    ('3QHF', f'{EXAMPLES}/3QHF_Fv.pdb', 'H', 'L'),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=20.0)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--chip-rate', type=float, default=89.5,
                    help='measured chip-side train samples/s (PERF.md)')
    args = ap.parse_args()

    from ab_opt_tpu.data.collate import PaddingCollate
    from ab_opt_tpu.data.loader import DataLoader, TransformedDataset
    from ab_opt_tpu.data.structures import preprocess_antibody_structure
    from ab_opt_tpu.data.transforms import get_transform

    structures = []
    for sid, path, h, l in COMPLEXES:
        s = preprocess_antibody_structure(
            {'id': sid, 'pdb_path': path, 'heavy_id': h, 'light_id': l})
        assert s is not None, sid
        structures.append(s)

    tfm = get_transform([
        {'type': 'mask_single_cdr', 'augmentation': True},
        {'type': 'merge_chains'},
        {'type': 'patch_around_anchor', 'initial_patch_size': 96,
         'antigen_size': 64},
    ])
    # Epoch-scale dataset: cycle the 4 complexes to SAbDab-like length so
    # worker startup amortizes the way it would in a real run.
    items = list(itertools.islice(itertools.cycle(structures), 2048))
    ds = TransformedDataset(items, tfm, seed=0)
    collate = PaddingCollate()

    for nw in (0, 4, 8):
        loader = DataLoader(ds, args.batch, collate_fn=collate, shuffle=True,
                            seed=1, num_workers=nw)
        it = iter(loader)
        next(it)  # warm the pool / prefetch thread
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < args.seconds:
            try:
                next(it)
            except StopIteration:
                it = iter(loader)
                continue
            n += args.batch
        dt = time.perf_counter() - t0
        rate = n / dt
        overhead = max(0.0, args.chip_rate / rate - 1.0) * 100.0
        print(f'num_workers={nw}: {rate:8.1f} samples/s host-side '
              f'(chip {args.chip_rate}: overlapped overhead ~{overhead:.1f}%)',
              flush=True)
        loader.close()


if __name__ == '__main__':
    main()
