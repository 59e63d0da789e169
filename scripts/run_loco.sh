#!/bin/bash
# Leave-one-complex-out generalization protocol at production dims
# (VERDICT r3 #3): rotate each bundled complex as the held-out eval target,
# train 128/64x6 on the other three, sampling-eval on the held-out one.
# The antigen-held-out split in miniature (ref AbDesign/diffab/utils/train.py:302).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
STEPS="${STEPS:-6000}"
for ID in 7DK2 5mes 7bsd 3QHF; do
  OUT="/tmp/loco_${ID}"
  echo "=== LOCO holdout=${ID} steps=${STEPS} -> ${OUT} ==="
  python scripts/validation_train.py --dims production --steps "$STEPS" \
    --eval_every 2000 --holdout "$ID" --out "$OUT" 2>&1 | tail -40
done
echo "LOCO_ALL_DONE"
