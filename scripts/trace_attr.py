"""Source-level byte/time attribution of a rollout-step program.

Combines two views of the SAME compiled step:
  1. jax.profiler device trace -> per-fusion execution time (ms)
  2. compiled HLO text -> per-fusion operand/output byte volumes (physical
     tile-padded sizes) and the op_name metadata XLA carries (the jax
     source path: scan/body/... function names + source lines)

and prints fusions grouped by source location, sorted by time — the table
that says WHERE a bandwidth-saturated step's gigabytes live.

Safe on the tunnel backend: the AOT lower().compile() used for HLO text
happens AFTER all executions (executing after AOT-compiling a program with
hoisted closure constants panics the tunnel client — see roofline.py).

Usage: python scripts/trace_attr.py [prod|twoply_tuned|...] [batch] [top_n]
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench_r2_sweep import variant_cfg
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.utils.profiling import device_op_times

NAME = sys.argv[1] if len(sys.argv) > 1 else "prod"
B = int(sys.argv[2]) if len(sys.argv) > 2 else (1024 if NAME.startswith("twoply") else 4096)
TOP = int(sys.argv[3]) if len(sys.argv) > 3 else 40

cfg = variant_cfg(NAME)
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(jax.random.fold_in(key, 1), B)
temp = td.temperature(jnp.zeros((), jnp.int32), cfg)


def step_fn(state, key):
    new_state, _ = actor.rollout_step(params, state, key, temp, cfg, continuous=True)
    return new_state


step = jax.jit(step_fn)
state = step(state, jax.random.PRNGKey(9))  # compile + warm via the jit path
times = device_op_times(step, state, jax.random.PRNGKey(10))

# ---- HLO text (AOT, AFTER all executions) ----
hlo = step.lower(state, jax.random.PRNGKey(10)).compile().as_text()

DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
               "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "f64": 8}
SUBLANE = {1: 32, 2: 16, 4: 8, 8: 8}  # second-minor tile per dtype width


def shape_bytes(stype: str) -> int:
    """Physical (tile-padded) bytes of one HLO shape string like
    f32[4096,96,52]{2,1,0:T(8,128)} or s8[1024,27]."""
    m = re.match(r"(\w+)\[([\d,]*)\]", stype)
    if not m:
        return 0
    dt, dims_s = m.groups()
    bs = DTYPE_BYTES.get(dt, 4)
    dims = [int(d) for d in dims_s.split(",") if d] or [1]
    # pad minor dim to 128 lanes, second-minor to the dtype's sublane tile
    if len(dims) >= 1:
        dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) >= 2:
        sl = SUBLANE.get(bs, 8)
        dims[-2] = -(-dims[-2] // sl) * sl
    n = 1
    for d in dims:
        n *= d
    return n * bs


# map: instruction name -> (bytes_total, op_name metadata)
info = {}
for line in hlo.splitlines():
    mm = re.match(r"\s*(?:ROOT )?%?([\w.-]+) = (\S+) (\w+)\((.*)", line)
    if not mm:
        continue
    iname, stype, opkind, rest = mm.groups()
    meta = ""
    mo = re.search(r'op_name="([^"]+)"', line)
    if mo:
        meta = mo.group(1)
    out_b = sum(shape_bytes(s) for s in re.findall(r"\w+\[[\d,]*\]", stype))
    # operand shapes are not on the call line for fusions; approximate with
    # the parameter shapes listed in the operand tuple when present
    opnd_b = 0
    for s in re.findall(r"(\w+\[[\d,]*\])", rest):
        opnd_b += shape_bytes(s)
    info[iname] = (out_b + opnd_b, meta)

# group trace times by source (op_name metadata), with bytes where known
agg = collections.defaultdict(lambda: [0.0, 0, 0])
for name, ms in times.items():
    b, meta = info.get(name, (0, ""))
    # group by the named_scope path (engine phase labels); fall back to the
    # raw fusion name prefix when no scope tag is present
    parts = (meta or "").split("/")
    tag = "/".join(
        q for q in parts
        if re.match(r"(nd\d\d|dd\d|nd_front|nd_tail\w*|dd_L\d|slotv|sel|take|roll\d+|mg_merge|act_t\d|env_step)$", q)
    )
    src = tag or re.sub(r"\.\d+$", "", name)
    agg[src][0] += ms
    agg[src][1] += b
    agg[src][2] += 1

tot_ms = sum(v for v in times.values())
tot_b = sum(info.get(n, (0, ""))[0] for n in times)
print(f"{NAME} B={B}: device {tot_ms:.1f}ms, ~{tot_b/1e9:.1f}GB touched "
      f"(per-fusion operand+output, tile-padded)")
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:TOP]
for src, (ms, b, n) in rows:
    print(f"{ms:7.2f}ms {b/1e6:9.1f}MB {n:4d}x  {src[:110]}")
