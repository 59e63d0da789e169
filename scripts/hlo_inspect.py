"""Dump the optimized HLO of the full sampling call and summarize fusions.

Compiles the same jitted sample call as scripts/trace_step.py (sample mode),
writes the optimized HLO text to /tmp/sample_hlo.txt, then prints, for every
fusion / custom-call in the while body, its name, output shape, and the ops
inside its fused computation — so trace op names (fusion.1437, ...) can be
mapped back to model code.

Usage: python scripts/hlo_inspect.py [N] [L] [reps]
"""
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

from __graft_entry__ import _make_batch
from ab_opt_tpu.models import DiffAb, DiffAbConfig


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    cfg = DiffAbConfig(dtype='bfloat16')
    model = DiffAb(cfg)
    batch = _make_batch(N=N // reps if reps > 1 else N, L=L)
    params = model.init(jax.random.key(0), batch)
    f = jax.jit(lambda pa, b, k: model.sample(pa, b, k, num_replicas=reps))
    compiled = f.lower(params, batch, jax.random.key(1)).compile()
    hlo = compiled.as_text()
    out = pathlib.Path('/tmp/sample_hlo.txt')
    out.write_text(hlo)
    print(f'wrote {len(hlo)/1e6:.1f} MB to {out}')

    # Parse fused computations: "%fused_computation.N (...) -> shape {...}"
    # and the callers: "%name.N = shape fusion(...), kind=..., calls=%fused..."
    fusion_body = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r'\s*%?(\S+) \([^)]*\) -> (\S+) {', line)
        if m and ('fused' in m.group(1) or 'computation' in m.group(1)):
            cur = m.group(1)
            fusion_body[cur] = []
            continue
        if cur is not None:
            if line.startswith('}'):
                cur = None
                continue
            mo = re.match(r'\s*(?:ROOT )?%?\S+ = \S+ ([a-z][a-z0-9-]*)\(', line)
            if mo and mo.group(1) not in ('parameter', 'constant'):
                fusion_body[cur].append(mo.group(1))

    # Map caller name -> (shape, called computation)
    for line in hlo.splitlines():
        m = re.match(r'\s*(?:ROOT )?%?([\w.-]+) = ([^ ]+) fusion\(.*calls=%?([\w.-]+)',
                     line)
        if m:
            name, shape, comp = m.groups()
            body = fusion_body.get(comp, [])
            from collections import Counter
            cnt = Counter(body)
            summ = ' '.join(f'{k}x{v}' if v > 1 else k
                            for k, v in cnt.most_common(8))
            print(f'{name:36s} {shape:46s} {summ[:90]}')


if __name__ == '__main__':
    main()
