#!/bin/bash
# Round-5 evidence suite (VERDICT r4 items 4, 5b, 6) — sequential TPU runs.
#   a) at-scale synthetic convergence: DeMF-VoteNet, 300 fresh-generator
#      scenes, 2k steps, periodic fresh-scene eval (docs/PARITY_RUN.md
#      companion evidence)
#   b) ball-query approx-vs-exact A/B at 2k steps on the same regime
#   c) DeMF-FCAF3D fusion ablation with headroom (--gen-eval: classes
#      distinguishable only via image cues on fresh scenes)
# Logs to /tmp/evidence/*.log; each stage is independent.
set -u
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p /tmp/evidence
cd "$(dirname "$0")/.."

echo "=== [1/4] demf convergence (300 scenes, 2000 steps) ==="
timeout 7200 python -u tools/overfit_check.py --model demf \
    --scenes 300 --steps 2000 --gen-eval --eval-every 250 \
    > /tmp/evidence/demf_convergence.log 2>&1
echo "rc=$? (demf_convergence)"

echo "=== [2/4] ball-query A/B: exact (2000 steps) ==="
timeout 5400 python -u tools/overfit_check.py --model votenet \
    --ball-query exact --scenes 300 --steps 2000 --gen-eval \
    --eval-every 500 > /tmp/evidence/bq_exact.log 2>&1
echo "rc=$? (bq_exact)"

echo "=== [3/4] ball-query A/B: approx (2000 steps) ==="
timeout 5400 python -u tools/overfit_check.py --model votenet \
    --ball-query approx --scenes 300 --steps 2000 --gen-eval \
    --eval-every 500 > /tmp/evidence/bq_approx.log 2>&1
echo "rc=$? (bq_approx)"

echo "=== [4/4] demf_fcaf3d fusion ablation (gen-eval) ==="
timeout 5400 python -u tools/overfit_check.py --model demf_fcaf3d \
    --gen-eval --scenes 64 --steps 600 \
    > /tmp/evidence/fusion_ablation.log 2>&1
echo "rc=$? (fusion_ablation)"

echo "=== evidence suite done ==="
