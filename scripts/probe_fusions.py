"""Attribute device-trace fusion times to source ops: compile the production
rollout step, dump the optimized HLO, and for each top-timed fusion print its
body's op histogram + the largest tensor shapes + source metadata lines.

Usage: python scripts/probe_fusions.py [variant] [batch] [topn]
"""
import collections
import re
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")
import jax
import jax.numpy as jnp

from bench_r2_sweep import variant_cfg
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.utils.profiling import device_op_times

name = sys.argv[1] if len(sys.argv) > 1 else "prod"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
TOPN = int(sys.argv[3]) if len(sys.argv) > 3 else 12

cfg = variant_cfg(name)
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(jax.random.fold_in(key, 1), B)
temp = td.temperature(jnp.zeros((), jnp.int32), cfg)


@jax.jit
def step(state, key):
    new_state, _ = actor.rollout_step(params, state, key, temp, cfg, True)
    return new_state


lowered = step.lower(state, jax.random.PRNGKey(10))
compiled = lowered.compile()
hlo = compiled.as_text()
state2 = step(state, jax.random.PRNGKey(9))
times = device_op_times(step, state2, jax.random.PRNGKey(10))

# Parse fusion computations: "%fused_computation.N (...)" bodies plus the
# fusion instruction that calls each (calls=%fused_computation.N).
call_of = {}  # computation name -> fusion instruction name
for m in re.finditer(r"%?([\w.-]+) = [^\n]*fusion\([^\n]*calls=%?([\w.-]+)", hlo):
    call_of[m.group(2)] = m.group(1)

bodies = {}  # computation name -> list of body lines
cur = None
for line in hlo.splitlines():
    m = re.match(r"%?([\w.-]+) \([^)]*\) -> .* \{", line.strip())
    if m:
        cur = m.group(1)
        bodies[cur] = []
    elif cur is not None:
        if line.strip() == "}":
            cur = None
        else:
            bodies[cur].append(line.strip())

by_fusion = {call_of.get(c, c): b for c, b in bodies.items()}

tot = sum(times.values())
print(f"{name} B={B}: total device {tot:.2f}ms over {len(times)} ops")
for opname, t in list(times.items())[:TOPN]:
    print(f"\n=== {t:6.2f}ms  {opname}")
    body = by_fusion.get(opname)
    if body is None:
        # try stripping trailing ".N" duplicates inserted by the profiler
        body = by_fusion.get(opname.split("%")[-1])
    if body is None:
        print("    (no fusion body found — custom call / copy / param?)")
        # show the instruction line itself for context
        for line in hlo.splitlines():
            if f"%{opname} " in line or f" {opname} " in line:
                print("   ", line.strip()[:300])
                break
        continue
    hist = collections.Counter()
    shapes = collections.Counter()
    meta = collections.Counter()
    for line in body:
        m = re.match(r"%?[\w.-]+ = ([a-z0-9\[\],]+ )?([\w-]+)\(", line)
        if m:
            hist[m.group(2)] += 1
            sm = re.match(r"%?[\w.-]+ = (\w+)\[([\d,]*)\]", line)
            if sm:
                dt, dims = sm.group(1), sm.group(2)
                try:
                    n = 1
                    for d in dims.split(","):
                        if d:
                            n *= int(d)
                    shapes[f"{dt}[{dims}]"] = max(shapes[f"{dt}[{dims}]"], n) if f"{dt}[{dims}]" in shapes else n
                except ValueError:
                    pass
        mm = re.search(r'op_name="([^"]+)"', line)
        if mm:
            meta[mm.group(1)] += 1
    print("    ops:", dict(hist.most_common(8)))
    big = sorted(shapes.items(), key=lambda kv: -kv[1])[:4]
    print("    biggest tensors:", [k for k, _ in big])
    print("    source op_names:")
    for s, c in meta.most_common(6):
        print(f"      {c:3d}x {s[:160]}")
