#!/bin/bash
# Round-5 docket — status ledger + remaining TPU queue.
# Run items individually; only one process can use the TPU at a time, and
# executing a hoisted-constants program after AOT-compiling it (or running
# two different shard_map meshes in one process) trips toolchain bugs
# documented in scripts/roofline.py and scripts/probe_train_gap.py.
set -u
cd /root/repo

# DONE this round (see PERF.md round 5 + artifacts/):
#  1. roofline.py — measured peaks (177.6 TF bf16, 599 GB/s HBM, 0.88ms
#     pipelined dispatch); 1-ply step at 27% of peak BW (NOT the envelope;
#     ~2M env-steps/s ceiling on v5e), 2-ply step SATURATED at 629 GB/s
#     (only byte cuts can help). bench.py emits mfu/achieved_bw_frac.
#  2. trace_attr.py — named-scope phase attribution of the 2-ply step
#     (artifacts/attr_twoply_r05.txt).
#  3. int8 one-hot takes + int8 select grids + int8 rank lanes + merged nd
#     child take (exactness suites green; first in-context A/B of int8
#     takes alone was ~neutral — isolated probe wins don't transfer).
#  4. train --mode continuous now uses the fused 1x1-mesh train step.
#  5. SPMD weak-scaling table (virtual CPU mesh) in RESULTS.md.
#  6. Test suite tiered: default <4min, slow tier ~25min.
#  7. experimental/ quarantine of rejected pipelines.

# REMAINING TPU queue (in order):
# timeout 2400 python scripts/bench_twoply.py 1024 24         # slimming A/B
# timeout 2400 python scripts/probe_train_gap.py fused 8      # training number
# timeout 2400 python scripts/probe_train_gap.py pyloop 8     # gap attribution
# timeout 2400 python bench.py                                # 1-ply official
# timeout 3600 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate \
#   --agent-policy twoply --twoply-tuned --opponent twoply \
#   --opponent-scorer exact --games 4096                      # direct quality guard
# timeout 3000 python scripts/trace_attr.py twoply_tuned 1024 60  # post-slim trace
# stretch: 500k-episode 2-ply self-play run (VERDICT item 10)
echo "r5 docket is a ledger; run items by hand"
