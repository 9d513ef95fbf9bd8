"""Phase timing with UNIQUE inputs per call (the tunnel memoizes repeats)."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2
from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
from mlp_ppo_2ply_multi_tpu.model import value_net
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = 8
cfg = Config()
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(key, B)
dices = [jax.random.randint(jax.random.PRNGKey(100 + i), (B, 2), 1, 7) for i in range(N + 1)]

def timeit(name, fn, args_list):
    f = jax.jit(fn)
    t0 = time.perf_counter(); jax.block_until_ready(f(*args_list[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(*a) for a in args_list[1:]]
    jax.block_until_ready(outs)
    tr = (time.perf_counter() - t0) / (len(args_list) - 1)
    print(f"{name}: compile {tc:.0f}s steady {tr*1000:.1f}ms -> {B/tr:,.0f}/s", flush=True)

timeit("movegen2_full", lambda d: MG2.legal_moves(state.board, state.player, d, cfg.movegen).count,
       [(d,) for d in dices])
timeit("movegen2_nd", lambda d: MG2.enumerate_nondoubles(state.board, state.player, d, cfg.movegen).count,
       [(d,) for d in dices])
timeit("movegen2_dd", lambda d: MG2.enumerate_doubles(state.board, state.player, d[:, 0], cfg.movegen).count,
       [(d,) for d in dices])

ms = jax.jit(lambda d: MG2.legal_moves(state.board, state.player, d, cfg.movegen))(dices[0])
def encfwd(pl):
    cand = encode_board(ms.boards, pl[..., None])
    return value_net.forward(params, cand, cfg.model).sum()
pls = [state.player + 0 * i for i in range(2)]  # only 2 variants possible (0/1)... vary via noise
# vary by adding tiny noise to params instead
def encfwd2(eps):
    p2 = {k: v + eps for k, v in params.items()}
    cand = encode_board(ms.boards, state.player[..., None])
    return value_net.forward(p2, cand, cfg.model).sum()
timeit("encode+forward[B,512,198]", encfwd2, [(jnp.float32(i) * 1e-9,) for i in range(N + 1)])

def envstep(d):
    a = (d[:, 0] * 7 + d[:, 1]) % 512
    return vec_env.step(state, ms, a, d, cfg.env).state.step_count
timeit("env.step", envstep, [(d,) for d in dices])
