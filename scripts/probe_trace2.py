"""Detailed device-op trace of the production rollout step: per-op times WITH
HLO long names (shapes), grouped totals by leading batch dim (4096 = main
batch nd/env/value, 1366 = doubles sub-batch at B=4096, div=3)."""
import sys

sys.path.insert(0, ".")
import collections
import glob
import gzip
import json

import jax
import jax.numpy as jnp

from bench import production_config
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
TOP = int(sys.argv[2]) if len(sys.argv) > 2 else 60
cfg = production_config()
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(jax.random.fold_in(key, 1), B)
temp = td.temperature(jnp.zeros((), jnp.int32), cfg)


@jax.jit
def step(state, key):
    new_state, _ = actor.rollout_step(params, state, key, temp, cfg, continuous=True)
    return new_state


state = jax.block_until_ready(step(state, jax.random.PRNGKey(9)))
trace_dir = "/tmp/jaxtrace_prof2"
with jax.profiler.trace(trace_dir):
    jax.block_until_ready(step(state, jax.random.PRNGKey(10)))

path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as fh:
    trace = json.load(fh)
pid_names = {}
for e in trace.get("traceEvents", []):
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")

rows = []
for e in trace.get("traceEvents", []):
    if e.get("ph") == "X" and "dur" in e and "TPU" in pid_names.get(e.get("pid"), ""):
        nm = e.get("name", "?")
        if nm.startswith("jit_"):
            continue
        ln = (e.get("args") or {}).get("long_name", "")
        ba = int((e.get("args") or {}).get("bytes_accessed", 0))
        rows.append((e["dur"] / 1000.0, nm, ln, ba))

agg = collections.defaultdict(lambda: [0.0, "", 0, 0])
for dur, nm, ln, ba in rows:
    a = agg[nm]
    a[0] += dur
    a[1] = ln
    a[2] += ba
    a[3] += 1

total = sum(a[0] for a in agg.values())
print(f"total device {total:.2f}ms over {len(rows)} events / {len(agg)} unique ops")
for nm, (dur, ln, ba, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:TOP]:
    gbps = (ba / 1e9) / (dur / 1e3) if dur > 0 else 0
    print(f"{dur:7.3f}ms x{cnt} {gbps:6.1f}GB/s  {nm:34s} {ln[:150]}")
