#!/usr/bin/env python
"""Convert a reference (pengzhangzhi/ab_opt) torch checkpoint to this
framework's checkpoint format.

  python scripts/convert_checkpoint.py ref_250000.pt out.ckpt

Requires torch (CPU is fine) to unpickle the source file; the result is a
torch-free pickle loadable by ab_opt_tpu.train.load_checkpoint and the
runners' --ckpt flag (the architecture is rebuilt from the embedded config).
"""
import argparse
import sys


def torch_cfg_to_dict(cfg):
    """EasyDict/dict/Namespace -> plain dict, recursively."""
    if hasattr(cfg, 'items'):
        return {k: torch_cfg_to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [torch_cfg_to_dict(v) for v in cfg]
    return cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('src', help='reference torch checkpoint (.pt)')
    parser.add_argument('dst', help='output checkpoint path (.ckpt)')
    parser.add_argument('--num_layers', type=int, default=None,
                        help='GAEncoder depth (default: from config)')
    args = parser.parse_args()

    import torch

    sys.path.insert(0, '.')
    from ab_opt_tpu.train.checkpoint import save_checkpoint
    from ab_opt_tpu.utils.torch_convert import convert_diffab_state_dict

    saved = torch.load(args.src, map_location='cpu', weights_only=False)
    config = torch_cfg_to_dict(saved.get('config', {}))
    model_cfg = config.get('model', {})
    num_layers = args.num_layers or model_cfg.get('diffusion', {}).get(
        'eps_net_opt', {}).get('num_layers', 6)

    state_dict = saved['model'] if 'model' in saved else saved
    params = convert_diffab_state_dict(state_dict, num_layers=num_layers)

    save_checkpoint(args.dst, config=config, params=params,
                    iteration=int(saved.get('iteration', 0)),
                    extra={'converted_from': args.src})
    print(f'converted {args.src} -> {args.dst} '
          f'({num_layers}-layer diffab, it {saved.get("iteration", 0)})')


if __name__ == '__main__':
    main()
