#!/bin/bash
# On-chip chained-kernel sweep, unbuffered to a log (tail-piping a
# background run hides all interim output).
cd "$(dirname "$0")/.."
exec python -u scripts/micro_chain.py "$@"
