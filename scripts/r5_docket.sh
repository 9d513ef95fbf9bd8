#!/bin/bash
# Round-5 continuation docket: the measurement/implementation queue left by
# round 4 (see PERF.md "Round-4 passes" for the evidence behind each item).
# Run items individually — the tunnel tolerates ~2-3 distinct large programs
# per process, and only one process can use the TPU at a time.
set -u
cd /root/repo
mkdir -p /tmp/docket5
run() {
  local nn=$1 name=$2 to=$3; shift 3
  echo "=== [$nn] $name start $(date)" | tee -a /tmp/docket5/driver.log
  timeout "$to" "$@" > "/tmp/docket5/${nn}_${name}.log" 2>&1
  echo "=== [$nn] $name exit=$? $(date)" | tee -a /tmp/docket5/driver.log
}

# 0. sanity + official numbers on whatever chip round 5 gets
run 00 bench_1ply 2400 python bench.py
run 01 bench_2ply 2400 python scripts/bench_twoply.py 1024 24

# 2. IMPLEMENT then bench: dd score-level merging in the 2-ply scorer —
#    gate per-level top-5 scores instead of materializing the merged/gated
#    board sets (extract enumerate_doubles_levels; value cost rises ~2-3x
#    but the level compaction/merge chain disappears). Evidence: dd scan's
#    board-materialization delta measured ~25ms of 43ms (PERF.md round 4).

# 3. IMPLEMENT then bench: precompute all 30 nd s2_valid grids in one
#    batched op outside the unrolled roll loop ([30,B,4,27,27] ~ 90MB).

# 4. The one-hot-take envelope: probe an int8-native / lane-sublane-split
#    take against the XLA bf16 einsum (scripts/probe_pallas_batched_dot.py
#    has the harness; add variants). Every flat profile bottoms out here.

# 5. DONE in round 4: apps/evaluate --twoply-tuned exists and the quality
#    guard ran — tuned 2-ply beat 1-ply greedy 58.0% (n=1024) vs the exact
#    scorer's 56.0%: no strength cost (RESULTS.md "2-ply vs 1-ply").
# 6. dd score-level merge (item 2): evidence update — with per-die widths
#    the level/merge chain is down to ~4-6ms while scoring all four level
#    sets costs ~+4-6ms of extra value rows: expected NET ~zero. Deprioritize
#    unless a trace shows otherwise.

echo "DOCKET 5 SEED COMPLETE $(date)" | tee -a /tmp/docket5/driver.log
