"""End-to-end design/docking runner for a single PDB complex.

TPU-native rewrite of the reference's
``AbDock/src/tools/runner/design_for_pdb.py:33-434`` +
``design_for_testset.py:27-138`` (create_data_variants):

  parse -> variants (mode) -> crop (PatchAroundAnchor [+RemoveNative]) ->
  batched reverse-diffusion sampling (all trajectories in one jitted scan,
  trajectory axis shardable over chips) -> partial backbone reconstruction
  (on device) -> paste back into the full complex -> save PDBs ->
  DockQ / AAR / pRMSD scoring -> consensus ranking -> results.csv + aa.csv.
"""
from __future__ import annotations

import copy
import dataclasses
import logging
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import metrics
from ..constants import CDR, BBHeavyAtom, Fragment, resindex_to_ressymb
from ..data import (
    apply_patch_to_tensor,
    get_transform,
    mask_select_data,
    preprocess_antibody_structure,
    save_pdb,
)
from ..data.collate import PaddingCollate, to_device_batch
from ..data.transforms import Compose, generate_mask_from_contig
from ..geometry import reconstruct_backbone_partially, so3vec_to_rotation
from ..models import DiffAb, DiffAbConfig
from ..parallel import replicate_batch
from ..tools.dockq import calc_dockq
from ..train.checkpoint import load_checkpoint

logger = logging.getLogger(__name__)

_CDR_NAMES = {int(CDR.H1): 'H_CDR1', int(CDR.H2): 'H_CDR2',
              int(CDR.H3): 'H_CDR3', int(CDR.L1): 'L_CDR1',
              int(CDR.L2): 'L_CDR2', int(CDR.L3): 'L_CDR3'}


def find_cdrs(structure) -> List[str]:
    """CDR names present in a structure (ref utils/inference.py:5-25)."""
    cdrs = []
    for key, prefix in (('heavy', 'H'), ('light', 'L')):
        if structure[key] is not None:
            flags = set(int(x) for x in np.unique(structure[key]['cdr_flag']))
            for i in (1, 2, 3):
                cdr = int(getattr(CDR, f'{prefix}{i}'))
                if cdr in flags:
                    cdrs.append(_CDR_NAMES[cdr])
    return cdrs


def get_residue_first_last(data):
    idx = np.flatnonzero(data['generate_flag'])
    lo, hi = int(idx.min()), int(idx.max())
    f = lambda i: (data['chain_id'][i], int(data['resseq'][i]), data['icode'][i])
    return f(lo), f(hi)


def create_data_variants(mode: str, sampling_cfg: Dict, structure,
                         rng: Optional[np.random.Generator] = None) -> List[Dict]:
    """Build masked+merged variants per the sampling mode."""
    rng = rng or np.random.default_rng(0)
    structure_id = structure['id']
    variants = []

    def run_tfm(tfm_cfg):
        return get_transform(tfm_cfg)(copy.deepcopy(structure), rng=rng)

    if mode == 'single_cdr':
        cdrs = sorted(set(find_cdrs(structure))
                      & set(sampling_cfg.get('cdrs', find_cdrs(structure))))
        for cdr_name in cdrs:
            data = run_tfm([
                {'type': 'mask_single_cdr', 'selection': cdr_name,
                 'augmentation': False},
                {'type': 'merge_chains'}])
            first, last = get_residue_first_last(data)
            variants.append({'data': data, 'name': f'{structure_id}-{cdr_name}',
                             'tag': cdr_name, 'cdr': cdr_name,
                             'residue_first': first, 'residue_last': last})
    elif mode == 'multiple_cdrs':
        cdrs = sorted(set(find_cdrs(structure))
                      & set(sampling_cfg.get('cdrs', find_cdrs(structure))))
        data = run_tfm([
            {'type': 'mask_multiple_cdrs', 'selection': cdrs,
             'augmentation': False},
            {'type': 'merge_chains'}])
        variants.append({'data': data, 'name': f'{structure_id}-MultipleCDRs',
                         'tag': 'MultipleCDRs', 'cdrs': cdrs,
                         'residue_first': None, 'residue_last': None})
    elif mode == 'dock_antibody':
        data = run_tfm([
            {'type': 'mask_full_antibody',
             'antibody_chains': sampling_cfg.get('antibody_chains', ['heavy'])},
            {'type': 'merge_chains'}])
        variants.append({'data': data, 'name': f'{structure_id}-{mode}',
                         'tag': mode, 'residue_first': None,
                         'residue_last': None})
    elif mode == 'full':
        data = run_tfm([{'type': 'mask_antibody'}, {'type': 'merge_chains'}])
        variants.append({'data': data, 'name': f'{structure_id}-Full',
                         'tag': 'Full', 'residue_first': None,
                         'residue_last': None})
    elif mode == 'abopt':
        cdrs = sorted(set(find_cdrs(structure))
                      & set(sampling_cfg.get('cdrs', find_cdrs(structure))))
        for cdr_name in cdrs:
            data = run_tfm([
                {'type': 'mask_single_cdr', 'selection': cdr_name,
                 'augmentation': False},
                {'type': 'merge_chains'}])
            first, last = get_residue_first_last(data)
            for opt_step in sampling_cfg.get('optimize_steps', [50]):
                variants.append({
                    'data': data, 'name': f'{structure_id}-{cdr_name}-O{opt_step}',
                    'tag': f'{cdr_name}-O{opt_step}', 'cdr': cdr_name,
                    'opt_step': opt_step, 'residue_first': first,
                    'residue_last': last})
    else:
        raise ValueError(f'Unknown mode: {mode}')
    return variants


@dataclasses.dataclass
class DesignArgs:
    pdb_path: str
    ckpt: Optional[str] = None          # None -> random init (tests/smoke)
    config: Optional[Dict] = None       # test config dict (mode, sampling, model)
    heavy: str = 'H'
    light: str = 'L'
    no_renumber: bool = True
    num_samples: int = 10
    batch_size: int = 16
    topk: int = 1
    seed: int = 0
    out_root: str = './results'
    tag: str = ''
    contig: str = ''
    label_heavy_as_cdr: bool = False
    keep_traj: bool = True
    run_dockq: bool = True
    id: str = ''
    stride: int = 1                     # >1: strided (DDIM-style) sampling


def load_model_from_checkpoint(ckpt_path: str):
    """Rebuild the exact architecture from the checkpoint's embedded config
    (ref design_for_pdb.py:89-95). Dispatches on the config's model type
    (diffab / diff_gnn / ...)."""
    from ..models import get_model
    saved = load_checkpoint(ckpt_path)
    model_cfg = dict(saved['config'].get('model', {'type': 'diffab'}))
    model_cfg.setdefault('type', 'diffab')
    model = get_model(model_cfg)
    return model, saved['params'], saved['config']


class BatchedSampler:
    """Jit-cached batched sampling + on-device backbone reconstruction.

    ``opt_step`` switches from full sampling to the optimize (noise-to-t
    then denoise) path.
    """

    @classmethod
    def get(cls, model, params, **kw) -> 'BatchedSampler':
        """Memoized constructor: one jitted sampler per (model, params,
        flags). Pipeline loops (optimize/testset: one design call per pose)
        otherwise rebuild the jit closure per pose and re-trace every time;
        with this cache + shape bucketing, compilation amortizes across the
        whole pose set (replaces the reference's Ray per-GPU workers)."""
        cache = getattr(model, '_sampler_cache', None)
        if cache is None:
            cache = model._sampler_cache = {}
        key = (id(params),) + tuple(sorted(kw.items()))
        if key not in cache:
            cache[key] = cls(model, params, **kw)
        return cache[key]

    def __init__(self, model: DiffAb, params, sample_structure=True,
                 sample_sequence=True, keep_traj=False,
                 opt_step: Optional[int] = None, stride: int = 1):
        self.model = model
        self.params = params
        self.keep_traj = keep_traj

        def run(params, batch, key, num_replicas):
            if opt_step is not None:
                if not hasattr(model, 'optimize'):
                    # The reference's DiffusionGNN.optimize is dead code
                    # (references undefined attrs, diff_gnn.py:305-325).
                    raise NotImplementedError(
                        f'{type(model).__name__} has no optimize path; use '
                        'the diffab model for abopt mode')
                # The optimize path starts from the native state; replicate
                # the input batch (cheap: no encode fan-out needed there).
                if num_replicas > 1:
                    batch = replicate_batch(batch, num_replicas)
                out = model.optimize(params, batch, key, opt_step=opt_step,
                                     sample_structure=sample_structure,
                                     sample_sequence=sample_sequence,
                                     keep_traj=keep_traj)
            else:
                kw = {'stride': stride} if stride != 1 else {}
                out = model.sample(params, batch, key,
                                   sample_structure=sample_structure,
                                   sample_sequence=sample_sequence,
                                   keep_traj=keep_traj,
                                   num_replicas=num_replicas, **kw)
            # Tile the context batch to the trajectory axis for backbone
            # reconstruction (sample() encodes once and fans out internally).
            B = out['s'].shape[0]
            tile = (lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:])
                    if x.shape[0] != B else x)
            pos_new, mask_new = reconstruct_backbone_partially(
                tile(batch['pos_heavyatom']), so3vec_to_rotation(out['v']),
                out['p'], out['s'], tile(batch['chain_nb']),
                tile(batch['res_nb']), tile(batch['mask_heavyatom']),
                tile(batch['generate_flag']))
            out['pos_atom_new'] = pos_new
            out['mask_atom_new'] = mask_new
            return out

        from ..utils.compile_cache import jit_sample
        self._fn = jit_sample(run, static_argnums=(3,))

    def __call__(self, batch_np: Dict, key,
                 num_replicas: int = 1) -> Dict[str, np.ndarray]:
        batch = to_device_batch(batch_np)
        out = self._fn(self.params, batch, key, num_replicas)
        return jax.tree_util.tree_map(np.asarray, out)


def _paste_sample(data_tmpl, data_cropped, aa_i, pos_i, mask_i, origin):
    """Paste a sampled patch back into the full merged complex."""
    aa = apply_patch_to_tensor(data_tmpl['aa'], aa_i, data_cropped['patch_idx'])
    mask_ha = apply_patch_to_tensor(data_tmpl['mask_heavyatom'], mask_i,
                                    data_cropped['patch_idx'])
    pos_ha = apply_patch_to_tensor(
        data_tmpl['pos_heavyatom'], pos_i + origin.reshape(1, 1, 3),
        data_cropped['patch_idx'])
    return aa, pos_ha, mask_ha


def _antigen_and_patch_mask(data_tmpl, data_cropped):
    antigen_mask = data_tmpl['fragment_type'] == int(Fragment.Antigen)
    patch_mask = np.zeros_like(antigen_mask)
    patch_mask[data_cropped['patch_idx']] = True
    return antigen_mask | patch_mask


def design_for_pdb(args: DesignArgs, model=None, params=None) -> Dict:
    """Run the full design/dock pipeline for one PDB. Returns summary dict.

    ``model``/``params`` may be passed in by pipeline loops (one model,
    many poses) to reuse the jitted sampler across calls; otherwise they
    are loaded from ``args.ckpt`` / built from ``args.config``.
    """
    cfg = args.config or {}
    mode = cfg.get('mode', 'single_cdr')
    sampling_cfg = dict(cfg.get('sampling', {}))
    rng = np.random.default_rng(args.seed)

    structure_id = args.id or os.path.basename(args.pdb_path)
    pdb_path = args.pdb_path
    if not args.no_renumber:
        from ..tools.renumber import renumber_antibody
        out_path = os.path.join(args.out_root, f'{structure_id}_chothia.pdb')
        os.makedirs(args.out_root, exist_ok=True)
        pdb_path, heavy_chains, light_chains = renumber_antibody(
            args.pdb_path, out_path)
        if args.heavy is None and heavy_chains:
            args.heavy = heavy_chains[0]
        if args.light is None and light_chains:
            args.light = light_chains[0]

    structure = preprocess_antibody_structure(
        {'id': structure_id, 'pdb_path': pdb_path,
         'heavy_id': args.heavy, 'light_id': args.light},
        label_whole_heavy_chain_as_cdr=args.label_heavy_as_cdr)
    if structure is None:
        raise ValueError(f'Failed to parse {args.pdb_path}')

    # Model: caller-provided, from checkpoint (arch from embedded config),
    # or random init.
    if model is None:
        if args.ckpt:
            model, params, ckpt_cfg = load_model_from_checkpoint(args.ckpt)
            cfg = dict(ckpt_cfg.get('test', {}), **cfg) if ckpt_cfg else cfg
        else:
            from ..models import get_model
            model_cfg = dict(cfg.get('model', {}))
            model_cfg.setdefault('type', 'diffab')
            model = get_model(model_cfg)
            params = None   # initialized lazily below

    log_dir = os.path.join(args.out_root,
                           f'{structure_id}_{args.tag}'.rstrip('_'))
    os.makedirs(log_dir, exist_ok=True)

    return design_for_structure(structure, model, params, cfg, args, log_dir,
                                rng)


def design_for_structure(structure, model, params, cfg: Dict,
                         args: DesignArgs, log_dir: str,
                         rng: Optional[np.random.Generator] = None) -> Dict:
    """Run the variant loop for an already-preprocessed structure.

    Used directly by the testset runner (dataset structures) and by
    :func:`design_for_pdb` (parsed files).
    """
    rng = rng or np.random.default_rng(args.seed)
    mode = cfg.get('mode', 'single_cdr')
    sampling_cfg = dict(cfg.get('sampling', {}))
    variants = create_data_variants(mode, sampling_cfg, structure, rng)

    # Metadata for the downstream relax/eval TaskScanners
    # (ref design_for_pdb.py:103-113).
    import json
    metadata = {
        'identifier': structure['id'],
        'items': [{k: v for k, v in var.items() if k != 'data'}
                  for var in variants],
    }
    with open(os.path.join(log_dir, 'metadata.json'), 'w') as f:
        json.dump(metadata, f, indent=2, default=str)

    # Inference crop: patch around anchor (+ optional native wipe). The
    # graph model additionally needs hotspot labels + property channels.
    model_type = cfg.get('model', {}).get('type', 'diffab')
    is_gnn = model_type == 'diff_gnn' or model.__class__.__name__ == 'DiffGNN'
    patch_cfg = {
        'type': 'patch_around_anchor_hotspot' if is_gnn else 'patch_around_anchor',
        'initial_patch_size': cfg.get('model', {}).get('initial_patch_size', 128),
        'antigen_size': cfg.get('model', {}).get('antigen_size', 128),
        'remove_anchor': cfg.get('model', {}).get('remove_anchor', False),
    }
    inference_steps = [patch_cfg]
    if is_gnn:
        inference_steps.append({'type': 'aa_label', 'hydropathy': True,
                                'charge': True})
    sample_structure = sampling_cfg.get('sample_structure', True)
    sample_sequence = sampling_cfg.get('sample_sequence', True)
    if mode != 'abopt' and not args.contig:
        inference_steps.append({'type': 'remove_native',
                                'remove_structure': sample_structure,
                                'remove_sequence': sample_sequence})
    inference_tfm = get_transform(inference_steps)

    # Coarse length buckets so crops from different poses/complexes land on
    # shared padded shapes — one compile serves the whole pose set.
    collate = PaddingCollate(buckets=(32, 48, 64, 96, 128, 160, 192, 224,
                                      256, 320, 384, 512))
    key = jax.random.key(args.seed)
    results: Dict[str, Dict] = {}
    aa_rows = []

    for variant in variants:
        vdir = os.path.join(log_dir, variant['tag'])
        os.makedirs(vdir, exist_ok=True)
        data_cropped = inference_tfm(copy.deepcopy(variant['data']), rng=rng)
        single = collate([data_cropped])

        if args.contig:
            gen_idx = np.flatnonzero(single['generate_flag'][0])
            contig = generate_mask_from_contig(args.contig, len(gen_idx))
            cm = np.zeros_like(single['generate_flag'])
            cm[0, gen_idx[contig]] = True
            single['generate_flag'] = single['generate_flag'] & cm

        if params is None:
            # Reuse one lazy random init per model so pipeline loops hit the
            # sampler cache (and its compiled code) across poses.
            params = getattr(model, '_lazy_params', None)
            if params is None:
                params = model.init(jax.random.key(args.seed),
                                    to_device_batch(single))
                model._lazy_params = params

        sampler = BatchedSampler.get(model, params,
                                     sample_structure=sample_structure,
                                     sample_sequence=sample_sequence,
                                     keep_traj=args.keep_traj,
                                     opt_step=variant.get('opt_step'),
                                     stride=args.stride)

        # Native reference patch (antigen + patch region) for DockQ.
        data_tmpl = variant['data']
        keep = _antigen_and_patch_mask(data_tmpl, data_cropped)
        native_patch = mask_select_data(copy.deepcopy(data_tmpl), keep)
        ref_path = os.path.join(vdir, 'REF1.pdb')
        save_pdb(native_patch, ref_path)

        scores = {k: [] for k in ('DockQ', 'irms', 'Lrms', 'fnat', 'AAR',
                                  'prmsd', 'PPL')}
        candidates = []
        count = 0
        gen_flag_full = apply_patch_to_tensor(
            data_tmpl['generate_flag'], single['generate_flag'][0][:len(data_cropped['aa'])],
            data_cropped['patch_idx'])
        native_aa_gen = data_tmpl['aa'][gen_flag_full]

        single_np = {k: v for k, v in single.items() if isinstance(v, np.ndarray)}
        # Stage wall-clocks for operational-scale runs (sampling incl.
        # device reconstruction; paste-back + per-sample PDB writes; DockQ;
        # consensus ranking) — logged per variant at the end.
        stage_s = {'sample': 0.0, 'paste_io': 0.0, 'dockq': 0.0, 'rank': 0.0}
        t_var0 = time.perf_counter()
        for lo in range(0, args.num_samples, args.batch_size):
            n = min(args.batch_size, args.num_samples - lo)
            t0 = time.perf_counter()
            out = sampler(single_np, jax.random.fold_in(key, lo),
                          num_replicas=n)
            stage_s['sample'] += time.perf_counter() - t0

            if args.keep_traj and lo == 0 and 'traj' in out:
                batch_np = {k: np.repeat(v, n, axis=0)
                            for k, v in single_np.items()}
                _save_trajectory(out, batch_np, data_tmpl, data_cropped,
                                 os.path.join(log_dir, 'traj.pdb'))

            origin = np.asarray(data_cropped['origin'])
            for i in range(n):
                aa_i = out['s'][i]
                pos_i = out['pos_atom_new'][i]
                mask_i = out['mask_atom_new'][i]
                prmsd_i = (round(float(out['prmsd'][:, i].mean()), 6)
                           if 'prmsd' in out else float('nan'))
                ppl_i = (round(float(out['perplexity'][-1, i]), 6)
                         if 'perplexity' in out else float('nan'))

                t0 = time.perf_counter()
                aa, pos_ha, mask_ha = _paste_sample(
                    data_tmpl, data_cropped, aa_i[:len(data_cropped['aa'])],
                    pos_i[:len(data_cropped['aa'])],
                    mask_i[:len(data_cropped['aa'])], origin)

                pred_aa_gen = aa[gen_flag_full]
                aar = metrics.amino_acid_recovery(pred_aa_gen, native_aa_gen)
                aa_rows.append({
                    'Region': variant['tag'],
                    'native_aa': ''.join(resindex_to_ressymb[int(x)]
                                         for x in native_aa_gen),
                    'sampled_aa': ''.join(resindex_to_ressymb[int(x)]
                                          for x in pred_aa_gen),
                    'AAR': aar, 'PPL': ppl_i,
                })

                data_out = dict(data_tmpl, aa=aa, pos_heavyatom=pos_ha,
                                mask_heavyatom=mask_ha)
                sample_patch = mask_select_data(data_out, keep)
                save_path = os.path.join(vdir, '%04d.pdb' % count)
                save_pdb(sample_patch, save_path)
                candidates.append(pos_ha[gen_flag_full][:, (BBHeavyAtom.N,
                                                            BBHeavyAtom.CA,
                                                            BBHeavyAtom.CB)])

                stage_s['paste_io'] += time.perf_counter() - t0

                row = {'AAR': aar, 'prmsd': prmsd_i, 'PPL': ppl_i}
                if args.run_dockq:
                    t0 = time.perf_counter()
                    dq = calc_dockq(save_path, ref_path, use_ca_only=True)
                    stage_s['dockq'] += time.perf_counter() - t0
                    row.update({k: round(dq[k], 3)
                                for k in ('DockQ', 'irms', 'Lrms', 'fnat')})
                for k, v in row.items():
                    scores[k].append(v)
                count += 1

        # Consensus ranking by pairwise structural similarity.
        t0 = time.perf_counter()
        cand = np.stack(candidates).reshape(count, -1, 3)
        topk_idx = metrics.rank_commonness(cand, min(args.topk, count))
        stage_s['rank'] = time.perf_counter() - t0
        logger.info(
            'variant %s timing (%d samples): sample=%.1fs paste+io=%.1fs '
            'dockq=%.1fs rank=%.1fs total=%.1fs', variant['tag'], count,
            stage_s['sample'], stage_s['paste_io'], stage_s['dockq'],
            stage_s['rank'], time.perf_counter() - t_var0)
        summary = {f'{k}_mean': round(float(np.mean(v)), 3)
                   for k, v in scores.items() if v}
        # Per-metric spread + full per-sample lists: the reference's
        # screening filters on DockQ_std / prmsd_std quantiles
        # (ab_opt.ipynb cells 5+7).
        summary.update({f'{k}_std': round(float(np.std(v)), 3)
                        for k, v in scores.items() if v})
        summary.update({f'{k}_all': [float(x) for x in v]
                        for k, v in scores.items()
                        if v and k in ('DockQ', 'prmsd')})
        summary.update({f'{k}_top{args.topk}': [scores[k][i] for i in topk_idx]
                        for k in scores if scores[k]})
        summary['per_sample_rmsd'] = round(metrics.average_pairwise_rmsd(cand), 3)
        summary['topk_idx'] = [int(i) for i in topk_idx]
        results[variant['tag']] = summary

    _write_csvs(results, aa_rows, log_dir)
    return results


def _save_trajectory(out, batch_np, data_tmpl, data_cropped, path,
                     sample_idx: int = 0):
    """Multi-MODEL PDB of one sample's reverse trajectory
    (ref design_for_pdb.py:166-209)."""
    traj = out['traj']
    T = traj['p'].shape[0]
    L = len(data_cropped['aa'])
    origin = np.asarray(data_cropped['origin'])
    keep = _antigen_and_patch_mask(data_tmpl, data_cropped)
    chunks = []
    for step in range(T):
        v_t = jnp.asarray(traj['v'][step, sample_idx:sample_idx + 1])
        p_t = jnp.asarray(traj['p'][step, sample_idx:sample_idx + 1])
        s_t = jnp.asarray(traj['s'][step, sample_idx:sample_idx + 1])
        b1 = {k: jnp.asarray(v[sample_idx:sample_idx + 1])
              for k, v in batch_np.items()}
        pos_new, mask_new = reconstruct_backbone_partially(
            b1['pos_heavyatom'],
            so3vec_to_rotation(v_t), p_t, s_t,
            b1['chain_nb'], b1['res_nb'], b1['mask_heavyatom'],
            b1['generate_flag'])
        aa, pos_ha, mask_ha = _paste_sample(
            data_tmpl, data_cropped, np.asarray(s_t[0][:L]),
            np.asarray(pos_new[0][:L]), np.asarray(mask_new[0][:L]), origin)
        data_out = dict(data_tmpl, aa=aa, pos_heavyatom=pos_ha,
                        mask_heavyatom=mask_ha)
        text = save_pdb(mask_select_data(data_out, keep))
        chunks.append(f'MODEL     {step + 1}\n{text}ENDMDL\n')
    with open(path, 'w') as f:
        f.write(''.join(chunks))


def _write_csvs(results: Dict, aa_rows: List[Dict], log_dir: str):
    import pandas as pd
    df = pd.DataFrame.from_dict(
        {tag: {k: v for k, v in summ.items() if not isinstance(v, list)}
         for tag, summ in results.items()}, orient='index')
    df.to_csv(os.path.join(log_dir, 'results.csv'))
    pd.DataFrame(aa_rows).to_csv(os.path.join(log_dir, 'aa.csv'), index=False)


# --------------------------------------------------------------------------- #
# AbDesign property-spec conditioning (ref AbDesign/diffab/utils/train.py:181
# eval_sample: hydropathy/charge specification strings over the CDR)
# --------------------------------------------------------------------------- #

_HYDRO_CHARS = {'+': 1, '-': 2, '?': 3}          # hydrophilic / moderate / unknown
_CHARGE_CHARS = {'+': 1, '-': 2, '=': 3, '?': 4}  # pos / neg / neutral / unknown


def apply_property_spec(data: Dict, hydropathy_spec: Optional[str] = None,
                        charge_spec: Optional[str] = None) -> Dict:
    """Condition the generate region on per-position property strings.

    Spec strings use one char per CDR position: hydropathy '+'/'-'/'?'
    (hydrophilic/moderate/unknown) and charge '+'/'-'/'='/'?'
    (positive/negative/neutral/unknown). Returns a copy of ``data`` with the
    'hydropathy'/'charge' channels set (AbDesign conditioning inputs).
    """
    data = dict(data)
    gen_idx = np.flatnonzero(data['generate_flag'])
    L = data['aa'].shape[0]
    for spec, chars, key, unknown in (
            (hydropathy_spec, _HYDRO_CHARS, 'hydropathy', 3),
            (charge_spec, _CHARGE_CHARS, 'charge', 4)):
        if spec is None:
            continue
        if len(spec) != len(gen_idx):
            raise ValueError(
                f'{key} spec length {len(spec)} != CDR length {len(gen_idx)}')
        labels = np.full(L, unknown, np.int64)
        labels[gen_idx] = [chars[c] for c in spec]
        data[key] = labels
    return data
