#!/bin/bash
# Round-3 continuation docket (fresh machine, /tmp wiped): serialize the
# remaining TPU jobs — 4096-game trajectory parity (VERDICT missing #2),
# 2-ply bench of the committed-but-unbenched sig-dedup/value-first work,
# then the two learning-curve parity training runs + curve eval
# (VERDICT missing #1). One job at a time: the tunnel exposes one chip.
set -u
cd /root/repo
mkdir -p /tmp/docket
run() { # run NN name timeout cmd...
  local nn=$1 name=$2 to=$3; shift 3
  echo "=== [$nn] $name start $(date)" | tee -a /tmp/docket/driver.log
  timeout "$to" "$@" > "/tmp/docket/${nn}_${name}.log" 2>&1
  echo "=== [$nn] $name exit=$? $(date)" | tee -a /tmp/docket/driver.log
}

run 00 sanity 300 python -c "import jax; x=jax.numpy.ones((256,256)); print((x@x).sum(), jax.devices())"

# 1. trajectory parity at full scale: jax side + compare vs committed ref transcript
run 01 traj_jax 3600 python scripts/trajectory_parity.py jax --games 4096 --out /tmp/traj_jax_4096.jsonl
run 02 traj_cmp 900 python scripts/trajectory_parity.py compare artifacts/traj_ref_4096.jsonl /tmp/traj_jax_4096.jsonl --out artifacts/trajectory_parity.json

# 2. 2-ply bench: sig dedup (cc9be80), value-first dedup (b4d30a4), slot-ctx
#    hoist (0b22ece) all landed after the last recorded 10,977 number
run 03 bench_twoply 2400 python scripts/bench_twoply.py 1024 8

# 3. learning-curve parity runs (td_mode=reference, Q2 per-episode updates)
run 04 ourrun_s0 5400 python scripts/run_parity_trainer.py --episodes 20000 --seed 0 --ckpt-every 2000 --out /tmp/ourrun_s0_tpu
run 05 ourrun_s1 5400 python scripts/run_parity_trainer.py --episodes 20000 --seed 1 --ckpt-every 2000 --out /tmp/ourrun_s1_tpu

# 4. curve eval for our two runs at 1000 games/point
run 06 curves 3600 python scripts/eval_curve_tpu.py --games 1000 --out /tmp/curves_r3b.json /tmp/ourrun_s0_tpu /tmp/ourrun_s1_tpu

echo "DOCKET COMPLETE $(date)" | tee -a /tmp/docket/driver.log
