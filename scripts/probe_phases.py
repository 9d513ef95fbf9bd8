"""Per-phase device timing via scanned loops (amortizes tunnel dispatch)."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig
from mlp_ppo_2ply_multi_tpu.engine.movegen import legal_moves, enumerate_nondoubles, enumerate_doubles
from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
from mlp_ppo_2ply_multi_tpu.model import value_net
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
REPS = 20
cfg = Config()
key = jax.random.PRNGKey(0)
state = vec_env.reset(key, B)
params = td.init_train_state(key, cfg).params

def timeit(name, fn, *args):
    t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
    tr = time.perf_counter() - t0
    print(f"{name}: compile {tc:.1f}s, steady {tr/REPS*1000:.1f}ms/iter -> {B*REPS/tr:,.0f} steps/s", flush=True)

def scan_wrap(body):
    @jax.jit
    def f(st):
        def step(c, _):
            return c, body(c)
        _, out = jax.lax.scan(step, st, None, length=REPS)
        return jax.tree.map(lambda a: a[-1] if hasattr(a, 'shape') and a.ndim else a, out)
    return f

bd, pl, dc = state.board, state.player, state.dice
timeit("movegen_full", scan_wrap(lambda st: legal_moves(st.board, st.player, st.dice, cfg.movegen).count), state)
timeit("nondoubles", scan_wrap(lambda st: enumerate_nondoubles(st.board, st.player, st.dice, cfg.movegen).count), state)
timeit("doubles", scan_wrap(lambda st: enumerate_doubles(st.board, st.player, st.dice[...,0].astype(jnp.int32), cfg.movegen).count), state)

ms = jax.jit(lambda st: legal_moves(st.board, st.player, st.dice, cfg.movegen))(state)
def enc_fwd(st):
    obs = encode_board(st.board, st.player)
    cand = encode_board(ms.boards, st.player[..., None])
    x = jnp.concatenate([obs[..., None, :], cand], axis=-2)
    return value_net.forward(params, x, cfg.model).sum()
timeit("encode+forward(A=512)", scan_wrap(enc_fwd), state)
