"""Per-level doubles frontier width distribution during realistic
production-config self-play — sizes a prospective two-tier doubles
expansion (narrow per-level widths for every doubles game + full-width
re-run of overflowers on a sub-batch).

Usage: python scripts/probe_dd_widths.py [B=4096] [STEPS=40]
"""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from bench import production_config
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.engine import movegen2
from mlp_ppo_2ply_multi_tpu.engine.movegen import slot_table
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 40
cfg = production_config()
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(jax.random.fold_in(key, 1), B)
temp = td.temperature(jnp.zeros((), jnp.int32), cfg)


@jax.jit
def step(state, key):
    new_state, _ = actor.rollout_step(params, state, key, temp, cfg, True)
    return new_state


@jax.jit
def dd_widths(board, player, dice):
    """Frontier popcount per doubles level (0 where the roll isn't a
    double). Mirrors enumerate_doubles' level structure at full widths."""
    mg = cfg.movegen
    is_dd = dice[:, 0] == dice[:, 1]
    die = dice[:, 0].astype(jnp.int32)
    s1 = slot_table(board, player, die)
    c1 = movegen2._popcount(s1.valid)

    idx1, ok1 = movegen2._select_set_bits(s1.valid, mg.w1)
    from mlp_ppo_2ply_multi_tpu.engine.movegen import board_expand
    from mlp_ppo_2ply_multi_tpu.engine.board import apply_submove
    from mlp_ppo_2ply_multi_tpu.engine.movegen import slot_params

    b0 = board_expand(board, mg.w1)
    pw = player[..., None]
    sg, eg, hg = slot_params(b0, pw, die[..., None], idx1)
    b1 = apply_submove(b0, pw, sg, eg, hg, ok1)
    p32 = jnp.broadcast_to(player.astype(jnp.int32)[..., None], idx1.shape)
    adj = jnp.where(p32 == 0, sg, 24 - 1 - sg)
    rank1 = jnp.where(sg == movegen2.BAR, -1, 2 * adj + (eg == movegen2.BEAR_OFF))
    front = movegen2._Frontier(
        boards=b1, last_rank=rank1,
        only=jnp.broadcast_to((c1 == 1)[..., None], ok1.shape), valid=ok1,
    )
    counts = [c1]
    for w in (mg.w2, mg.w3, mg.w4):
        front, _, _ = movegen2._expand(front, player, die, w)
        counts.append(movegen2._popcount(front.valid))
    z = is_dd.astype(jnp.int32)
    return jnp.stack([c * z for c in counts], axis=1), is_dd


acc = []
k = jax.random.PRNGKey(1)
for i in range(STEPS):
    k, sub = jax.random.split(k)
    w, is_dd = dd_widths(state.board, state.player, state.dice)
    wn = np.asarray(w)
    acc.append(wn[np.asarray(is_dd)])
    state = step(state, sub)

a = np.concatenate(acc, axis=0)  # [n_dd_decisions, 4]
print(f"dd decisions: {len(a)}")
for lvl in range(4):
    col = a[:, lvl]
    print(
        f"L{lvl+1}: p50={int(np.percentile(col, 50))} "
        f"p95={int(np.percentile(col, 95))} p99={int(np.percentile(col, 99))} "
        f"p999={int(np.percentile(col, 99.9))} max={int(col.max())}"
    )
