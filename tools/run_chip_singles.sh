#!/bin/bash
# Serial on-chip bench singles (one TPU process at a time — the tunnel
# serializes and two processes deadlock). Each metric in a fresh process
# (process contamination — CLAUDE.md). Usage:
#   bash tools/run_chip_singles.sh [metric ...] > /tmp/chip_singles.log 2>&1
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/tmp/sonar_jax_cache
METRICS=${@:-"proxy_euler proxy_euler_batched proxy_euler_bf16 proxy_euler_fast proxy_config3_fast dit_sampler"}
for m in $METRICS; do
  echo "=== $m start $(date -u +%H:%M:%S)"
  t0=$SECONDS
  timeout 560 python bench.py --single "$m"
  rc=$?
  echo "=== $m rc=$rc wall=$((SECONDS-t0))s"
done
