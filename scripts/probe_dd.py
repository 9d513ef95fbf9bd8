"""Bisect doubles expansion + nd stages at realistic sizes."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2
from mlp_ppo_2ply_multi_tpu.engine.movegen import slot_table, board_expand, board_take, _take_st, SlotTable
from mlp_ppo_2ply_multi_tpu.engine.board import apply_submove, pack_board
from mlp_ppo_2ply_multi_tpu.env import vec_env

Bs = 1366  # doubles sub-batch size for B=4096
N = 6
cfg = Config().movegen
key = jax.random.PRNGKey(0)
state = vec_env.reset(key, Bs)
bd, pl = state.board, state.player
dies = [jax.random.randint(jax.random.PRNGKey(400 + i), (Bs,), 1, 7) for i in range(N + 1)]

def timeit(name, fn):
    f = jax.jit(fn)
    t0 = time.perf_counter(); jax.block_until_ready(f(dies[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(d) for d in dies[1:]]
    jax.block_until_ready(outs)
    tr = (time.perf_counter() - t0) / N
    print(f"{name}: compile {tc:.0f}s steady {tr*1000:.1f}ms", flush=True)

def mk_front(d, w):
    s1 = slot_table(bd, pl, d)
    idx1, ok1 = MG2._select_set_bits(s1.valid, cfg.w1)
    st1 = _take_st(s1, idx1)
    b1 = apply_submove(board_take(board_expand(bd, 27), idx1), pl[..., None],
                       st1.start, st1.end, st1.hits, st1.valid & ok1)
    rank1 = jnp.take_along_axis(MG2._slot_rank(s1, pl), idx1, axis=-1)
    fr = MG2._Frontier(boards=b1, last_rank=rank1,
                       only=jnp.zeros_like(ok1), valid=ok1)
    for wi in ([], [cfg.w2], [cfg.w2, cfg.w3])[w]:
        fr, _ = MG2._expand(fr, pl, d, wi)
    return fr

timeit("level1_setup(w=16)", lambda d: mk_front(d, 0).boards.points.sum())
timeit("expand_16->128", lambda d: MG2._expand(mk_front(d, 0), pl, d, cfg.w2)[0].boards.points.sum())
timeit("expand_128->288", lambda d: MG2._expand(mk_front(d, 1), pl, d, cfg.w3)[0].boards.points.sum())
timeit("expand_288->512", lambda d: MG2._expand(mk_front(d, 2), pl, d, cfg.w4)[0].boards.points.sum())

# inside one expand at W=288: slot_table vs select vs gather/apply
def st_only(d):
    fr = mk_front(d, 2)
    return slot_table(fr.boards, pl[..., None], d[..., None]).valid.sum()
timeit("slot_table[Bs,288]", st_only)
def sel_only(d):
    fr = mk_front(d, 2)
    st = slot_table(fr.boards, pl[..., None], d[..., None])
    cv = (fr.valid[..., None] & st.valid).reshape(Bs, -1)
    return MG2._select_set_bits(cv, cfg.w4)[0].sum()
timeit("select[Bs,7776]->512", sel_only)
