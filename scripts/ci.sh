#!/usr/bin/env bash
# CI entry (VERDICT round-1 task 10): full test suite + bench smoke +
# on-chip kernel regression gate (the gate self-skips without a TPU).
#
#   bash scripts/ci.sh            # CPU suite + dry bench (+ TPU gate if attached)
#   CI_SKIP_TPU=1 bash scripts/ci.sh   # skip the on-chip gate explicitly
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest (CPU, 8-device virtual mesh) =="
python -m pytest tests/ -q

echo "== bench.py --dry (end-to-end bench path smoke) =="
python bench.py --dry

echo "== multichip dryrun (8/16/32 virtual CPU devices) =="
# 16/32 pinned in CI so the CLAUDE.md claim regenerates automatically
# (round-4 VERDICT weak #5); each count needs its own process — the
# virtual device count is fixed at backend init
for NDEV in 8 16 32; do
  XLA_FLAGS=--xla_force_host_platform_device_count=$NDEV python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as ge
ge.dryrun_multichip($NDEV)
print('dryrun OK at $NDEV devices')"
done

if [[ "${CI_SKIP_TPU:-0}" != "1" ]]; then
  echo "== on-chip Pallas kernel gate (compiled-vs-oracle) =="
  PYTHONPATH="$PWD:/root/.axon_site" python scripts/verify_kernels.py
fi

echo "CI OK"
