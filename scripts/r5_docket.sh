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

# ROUND-5 SESSION 2 (2026-08-20) — all queue items resolved:
#  8. training gap CLOSED: 274k -> ~420k sustained (packed metric pulls,
#     histogram cadence, fused update; PERF.md round-5 table)
#  9. split-planes pipeline: official 503.0k -> 523.3k -> 544,974 (with
#     two-level boundary search); negative results recorded (obs-row fold,
#     plane-local tier values)
# 10. direct tuned-vs-exact guard: 100.0% decision agreement, zero regret,
#     n=4096 (arena impossible on this toolchain — 7/7 TPU worker crashes,
#     documented in scripts/arena_twoply_parity.py)
# 11. 2-ply 14,312 -> 15,090; bandwidth envelope formally closed (PERF.md)
# 12. chunk8 flat vs chunk4; B=8192 still loses (516.7k); docs refreshed
echo "r5 docket complete; see PERF.md round-5 sections"
