#!/bin/bash
# Round-3 continuation docket C (runs after r3b_docket): the 2-ply self-play
# TRAINING demonstration (VERDICT round-2 item 9 — the last capability
# configuration never run end-to-end) at a budget sized to fit the session,
# plus a fresh 2-ply device trace for the next round's tail lever.
set -u
cd /root/repo
mkdir -p /tmp/docket
run() {
  local nn=$1 name=$2 to=$3; shift 3
  echo "=== [$nn] $name start $(date)" | tee -a /tmp/docket/driver.log
  timeout "$to" "$@" > "/tmp/docket/${nn}_${name}.log" 2>&1
  echo "=== [$nn] $name exit=$? $(date)" | tee -a /tmp/docket/driver.log
}

# 2-ply self-play training (live 2-ply rerank policy in the rollout) + a
# 1-ply twin at the same seed/budget, then arena the pair.
run 10 train_2ply 3600 python -m mlp_ppo_2ply_multi_tpu.apps.train --mode continuous --production --td-mode side0 --two-ply --batch-games 1024 --updates 60 --steps-per-update 64 --seed 21 --checkpoint-dir /tmp/ck_2ply_s21 --metrics-dir /tmp/runs_2ply_s21 --log-every 10
run 11 train_1ply_twin 1800 python -m mlp_ppo_2ply_multi_tpu.apps.train --mode continuous --production --td-mode side0 --batch-games 1024 --updates 60 --steps-per-update 64 --seed 21 --checkpoint-dir /tmp/ck_1ply_s21 --metrics-dir /tmp/runs_1ply_s21 --log-every 10
# run 12 isolates WEIGHT quality (both sides eval 1-ply greedy); run 12b
# evaluates the 2-ply-trained net WITH the live 2-ply policy it trained
# under, so training+play benefit is measured too (advisor round-3 item 4).
run 12 arena_2ply_twin 1800 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_2ply_s21 --opponent /tmp/ck_1ply_s21 --opponent-td-mode side0 --games 2048
run 12b arena_2ply_twin_live 2400 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_2ply_s21 --agent-policy twoply --opponent /tmp/ck_1ply_s21 --opponent-td-mode side0 --games 1024
run 13 arena_2ply_rand 1200 python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --td-mode side0 --checkpoint /tmp/ck_2ply_s21 --opponent random --games 2048

# fresh 2-ply op trace: the ~77ms out-of-scan tail is next round's lever
run 14 twoply_trace 1800 python scripts/probe_twoply_trace.py

echo "DOCKET C COMPLETE $(date)" | tee -a /tmp/docket/driver.log
