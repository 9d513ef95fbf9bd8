#!/bin/bash
# Round-3 TPU docket (VERDICT round-2 "Next round" items 1-6): run the whole
# measurement queue sequentially the moment the tunnel returns, logging each
# job to /tmp/docket/NN_name.log. Jobs are judgment-free; sizing decisions
# (dd_tier, fast() promotion) happen between polls based on these logs.
# Usage: bash scripts/tpu_docket.sh [start_step]
set -u
cd /root/repo
mkdir -p /tmp/docket
START=${1:-0}

run() { # run NN name timeout cmd...  (NN may carry a letter suffix: 05b)
  local nn=$1 name=$2 to=$3; shift 3
  local nn_num=${nn//[!0-9]/}
  if [ "$((10#$nn_num))" -lt "$START" ]; then echo "skip $nn $name"; return; fi
  echo "=== [$nn] $name start $(date)" | tee -a /tmp/docket/driver.log
  timeout "$to" "$@" > "/tmp/docket/${nn}_${name}.log" 2>&1
  echo "=== [$nn] $name exit=$? $(date)" | tee -a /tmp/docket/driver.log
}

# 0. sanity: one real device op
run 00 sanity 300 python -c "import jax; x=jax.numpy.ones((256,256)); print((x@x).sum(), jax.devices())"

# 1. bench sweep: confirms round-2 passes + measures unbenched nd-tail/die-tables/tiered
run 01 bench_sweep 7200 python scripts/bench_r2_sweep.py

# 2. dd_tier sizing probe
run 02 dd_widths 3600 python scripts/probe_dd_widths.py

# 3. trajectory parity at full scale (BASELINE config 2): JAX side + compare
run 03 traj_jax 7200 python scripts/trajectory_parity.py jax --games 4096 --out /tmp/traj_jax_4096.jsonl
run 04 traj_cmp 1800 python scripts/trajectory_parity.py compare /tmp/traj_ref_4096.jsonl /tmp/traj_jax_4096.jsonl --out artifacts/trajectory_parity.json

# 4. 2-ply: bench current state (reply tier + die tables) at two batch
#    sizes + device trace for the next lever
run 05 bench_twoply 7200 python scripts/bench_twoply.py 1024 12
run 05b bench_twoply4k 7200 python scripts/bench_twoply.py 4096 8
run 06 twoply_trace 3600 python scripts/probe_twoply_trace.py

# 5. learning-curve parity runs on TPU (matched hyperparameters)
run 07 ourrun_s0 14400 python scripts/run_parity_trainer.py --episodes 20000 --seed 0 --ckpt-every 2000 --out /tmp/ourrun_s0_tpu
run 08 ourrun_s1 14400 python scripts/run_parity_trainer.py --episodes 20000 --seed 1 --ckpt-every 2000 --out /tmp/ourrun_s1_tpu

# 6. curve eval for all four runs at 1000 games/point on the batched engine
run 09 curves 10800 python scripts/eval_curve_tpu.py --games 1000 --out /tmp/curves_r3.json /tmp/refrun_s0 /tmp/refrun_s1 /tmp/ourrun_s0_tpu /tmp/ourrun_s1_tpu /tmp/ourrun_s0 /tmp/ourrun_s1

# 7. fast-vs-full quality experiment (same seed/budget; ~8.2M episodes each)
run 10 prod_fast 7200 python -m mlp_ppo_2ply_multi_tpu.apps.train --mode continuous --production --td-mode side0 --batch-games 4096 --updates 2000 --steps-per-update 64 --seed 11 --checkpoint-dir /tmp/ck_fast_s11 --metrics-dir /tmp/runs_fast_s11 --log-every 100
run 11 prod_full 10800 python -m mlp_ppo_2ply_multi_tpu.apps.train --mode continuous --production --td-mode side0 --full-widths --batch-games 4096 --updates 2000 --steps-per-update 64 --seed 11 --checkpoint-dir /tmp/ck_full_s11 --metrics-dir /tmp/runs_full_s11 --log-every 100
run 12 fastfull_h2h 3600 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_fast_s11 --opponent /tmp/ck_full_s11 --games 4096
run 13 fast_vs_rand 1800 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_fast_s11 --opponent random --games 4096
run 14 full_vs_rand 1800 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_full_s11 --opponent random --games 4096

# 8. multi-seed production runs (seeds 12, 13) + evals vs random and vs reference best
run 15 prod_s12 7200 python -m mlp_ppo_2ply_multi_tpu.apps.train --mode continuous --production --td-mode side0 --batch-games 4096 --updates 2000 --steps-per-update 64 --seed 12 --checkpoint-dir /tmp/ck_prod_s12 --metrics-dir /tmp/runs_prod_s12 --log-every 100
run 16 prod_s13 7200 python -m mlp_ppo_2ply_multi_tpu.apps.train --mode continuous --production --td-mode side0 --batch-games 4096 --updates 2000 --steps-per-update 64 --seed 13 --checkpoint-dir /tmp/ck_prod_s13 --metrics-dir /tmp/runs_prod_s13 --log-every 100
run 17 s12_vs_rand 1800 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_prod_s12 --opponent random --games 4096
run 18 s13_vs_rand 1800 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_prod_s13 --opponent random --games 4096
run 19 s12_vs_refbest 1800 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_prod_s12 --opponent-td-mode reference --opponent /root/reference/src/play/backgammon_256_standard_episode_2100000.pth --games 4096
run 20 s13_vs_refbest 1800 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_prod_s13 --opponent-td-mode reference --opponent /root/reference/src/play/backgammon_256_standard_episode_2100000.pth --games 4096

# 9. fresh production trace at B=8192 for the next perf lever
run 21 prod_trace 3600 python scripts/probe_prod_trace.py tiered

# 10. sustained SPMD train-step throughput (1 device on this chip; the same
#     script emits the scaling column on a pod slice)
run 22 bench_spmd 7200 python scripts/bench_spmd.py --devices 1

# 11. 2-ply self-play TRAINING demonstration (VERDICT round-2 item 9): train
#     with the live 2-ply rerank policy, train a 1-ply twin at the same
#     seed/update budget, then arena them head-to-head (the reference
#     shipped 2-ply only as dead code; this closes the last capability
#     configuration never run end-to-end)
run 23 train_2ply 14400 python -m mlp_ppo_2ply_multi_tpu.apps.train --mode continuous --production --td-mode side0 --two-ply --batch-games 1024 --updates 120 --steps-per-update 64 --seed 21 --checkpoint-dir /tmp/ck_2ply_s21 --metrics-dir /tmp/runs_2ply_s21 --log-every 10
run 24 train_1ply_twin 7200 python -m mlp_ppo_2ply_multi_tpu.apps.train --mode continuous --production --td-mode side0 --batch-games 1024 --updates 120 --steps-per-update 64 --seed 21 --checkpoint-dir /tmp/ck_1ply_s21 --metrics-dir /tmp/runs_1ply_s21 --log-every 10
run 25 arena_2ply_twin 3600 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_2ply_s21 --opponent /tmp/ck_1ply_s21 --opponent-td-mode side0 --games 2048
run 26 arena_2ply_rand 1800 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_2ply_s21 --opponent random --games 2048

echo "DOCKET COMPLETE $(date)" | tee -a /tmp/docket/driver.log
