"""Differential tests for the sortless canonical engine (engine/movegen2).

Non-doubles must match the oracle's move sets AND insertion order exactly
(the canonical cell layout IS the reference order). Doubles must match as
SETS — canonical enumeration order is documented to differ (movegen2
docstring / SURVEY.md Q6)."""
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2
from mlp_ppo_2ply_multi_tpu.experimental import tiered as XT
from mlp_ppo_2ply_multi_tpu.oracle import rules
from tests.helpers import boards_to_jax, jax_board_to_tuple, sample_cases

# dd_subbatch_div=0: differential tests use skewed dice distributions (all
# doubles), which would overflow the iid-dice sub-batch; the sub-batch path
# has its own test below with realistic dice frequencies.
CFG = MoveGenConfig(algo="canonical", dd_subbatch_div=0)


@pytest.fixture(scope="module")
def jitted():
    return jax.jit(lambda b, p, d: MG2.legal_moves(b, p, d, CFG))


def test_dd_subbatch_matches_full():
    """The iid-dice doubles sub-batch path must agree with the full-batch
    path on a realistic mixed-dice batch (n > 64 triggers compaction)."""
    import random

    rng = random.Random(77)
    from mlp_ppo_2ply_multi_tpu.oracle import sampling

    n = 256
    boards = [sampling.random_board(rng) for _ in range(n)]
    players = [rng.randint(0, 1) for _ in range(n)]
    dice = [(rng.randint(1, 6), rng.randint(1, 6)) for _ in range(n)]
    jb = boards_to_jax(boards)
    pl = jnp.asarray(players, jnp.int32)
    dc = jnp.asarray(dice, jnp.int32)
    cfg_sub = MoveGenConfig(algo="canonical", dd_subbatch_div=3)
    ms_sub = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: MG2.legal_moves(b, p, d, cfg_sub))(jb, pl, dc))
    ms_full = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: MG2.legal_moves(b, p, d, CFG))(jb, pl, dc))
    np.testing.assert_array_equal(ms_sub.count, ms_full.count)
    np.testing.assert_array_equal(ms_sub.valid, ms_full.valid)
    for g in range(n):
        for k in range(int(ms_full.count[g])):
            assert jax_board_to_tuple(ms_sub.boards, g, k) == jax_board_to_tuple(
                ms_full.boards, g, k
            ), (g, k)


def _got_boards(ms, g):
    # the canonical engine's valid mask is not necessarily contiguous —
    # enumerate valid entries in slot order (== insertion order)
    ks = np.where(np.asarray(ms.valid[g]))[0]
    assert len(ks) == int(ms.count[g])
    return [jax_board_to_tuple(ms.boards, g, int(k)) for k in ks]


def run_order_diff(jitted, seed, n, doubles_bias):
    boards, players, dice = sample_cases(seed, n, doubles_bias)
    # order parity is guaranteed (and tested) for non-doubles only — doubles
    # use canonical order; force any chance doubles into non-doubles rolls
    dice = [(d0, d0 % 6 + 1) if d0 == d1 else (d0, d1) for d0, d1 in dice]
    jb = boards_to_jax(boards)
    ms = jax.tree.map(
        np.asarray,
        jitted(jb, jnp.asarray(players, dtype=jnp.int32), jnp.asarray(dice, dtype=jnp.int32)),
    )
    for g in range(n):
        want = [b for _, b in rules.full_moves(boards[g], players[g], list(dice[g]))]
        got = _got_boards(ms, g)
        assert got == want, (g, dice[g], players[g], boards[g])


def run_set_diff(jitted, seed, n, doubles_bias):
    boards, players, dice = sample_cases(seed, n, doubles_bias)
    jb = boards_to_jax(boards)
    ms = jax.tree.map(
        np.asarray,
        jitted(jb, jnp.asarray(players, dtype=jnp.int32), jnp.asarray(dice, dtype=jnp.int32)),
    )
    for g in range(n):
        want = {b for _, b in rules.full_moves(boards[g], players[g], list(dice[g]))}
        got = _got_boards(ms, g)
        assert len(got) == len(set(got)), ("dup presented", g, dice[g], boards[g])
        assert set(got) == want, (g, dice[g], players[g], boards[g])


def test_nondoubles_order_matches_oracle(jitted):
    run_order_diff(jitted, 111, 96, doubles_bias=0.0)


def test_nondoubles_more_seeds(jitted):
    run_order_diff(jitted, 112, 96, doubles_bias=0.0)
    run_order_diff(jitted, 113, 96, doubles_bias=0.0)


def test_doubles_sets_match_oracle(jitted):
    run_set_diff(jitted, 222, 96, doubles_bias=1.0)
    run_set_diff(jitted, 223, 96, doubles_bias=1.0)


def test_mixed_sets_match_oracle(jitted):
    run_set_diff(jitted, 333, 96, doubles_bias=0.4)


def test_bar_chain_dedup(jitted):
    """1 checker on the bar, non-doubles: the bar->enter->continue chains via
    either die order reach the same point and must be presented once when no
    intermediate blot exists (and twice when one does)."""
    cases = []
    # open opponent home so both entries are legal, no blots
    p1 = [0] * 24; p1[12] = 14
    p2 = [0] * 24; p2[23] = 15
    clean = (tuple(p1), tuple(p2), (1, 0), (0, 0))
    # opponent blot on one entry point
    p2b = [0] * 24; p2b[23] = 14; p2b[5] = 1  # blot at P1's 6-entry point
    blot = (tuple(p1), tuple(p2b), (1, 0), (0, 0))
    for d in [(6, 2), (5, 3), (6, 1)]:
        cases.append((clean, 0, d))
        cases.append((blot, 0, d))
    # P2 mirror
    q1 = [0] * 24; q1[0] = 15
    q2 = [0] * 24; q2[11] = 14
    clean2 = (tuple(q1), tuple(q2), (0, 1), (0, 0))
    for d in [(6, 2), (4, 3)]:
        cases.append((clean2, 1, d))

    boards = [c[0] for c in cases]; players = [c[1] for c in cases]; dice = [c[2] for c in cases]
    jb = boards_to_jax(boards)
    ms = jax.tree.map(
        np.asarray,
        jitted(jb, jnp.asarray(players, dtype=jnp.int32), jnp.asarray(dice, dtype=jnp.int32)),
    )
    for g in range(len(cases)):
        want = [b for _, b in rules.full_moves(boards[g], players[g], list(dice[g]))]
        got = _got_boards(ms, g)
        assert got == want, (g, dice[g], boards[g])


def test_bearoff_and_forced_positions(jitted):
    """Bear-off chains and forced-shorter doubles sequences."""
    cases = []
    # bear-off race, both dice bear off / chain into bear-off
    p1 = [0] * 24
    p1[18], p1[20], p1[22] = 2, 2, 2
    p2 = [0] * 24; p2[0] = 15
    bo = (tuple(p1), tuple(p2), (0, 0), (9, 0))
    for d in [(6, 5), (4, 2), (3, 3), (6, 6), (1, 1)]:
        cases.append((bo, 0, d))
    # blocked doubles: forced shorter sequences
    p1f = [0] * 24; p1f[0] = 2; p1f[12] = 13
    p2f = [0] * 24
    for i in (2, 3, 4, 14, 15, 16):
        p2f[i] = 2
    p2f[20] = 3
    forced = (tuple(p1f), tuple(p2f), (0, 0), (0, 0))
    for d in [(2, 2), (3, 3), (4, 4), (1, 1)]:
        cases.append((forced, 0, d))

    boards = [c[0] for c in cases]; players = [c[1] for c in cases]; dice = [c[2] for c in cases]
    jb = boards_to_jax(boards)
    ms = jax.tree.map(
        np.asarray,
        jitted(jb, jnp.asarray(players, dtype=jnp.int32), jnp.asarray(dice, dtype=jnp.int32)),
    )
    for g in range(len(cases)):
        want = {b for _, b in rules.full_moves(boards[g], players[g], list(dice[g]))}
        got = _got_boards(ms, g)
        assert len(got) == len(set(got)), (g, dice[g])
        assert set(got) == want, (g, dice[g], boards[g])


def test_canonical_env_rollout_membership():
    """Env-level check under the canonical engine: at every step the chosen
    afterstate is a member of the oracle's legal set and counts agree; the
    oracle is driven by board-matching so trajectories stay aligned."""
    from mlp_ppo_2ply_multi_tpu.core.config import Config
    from mlp_ppo_2ply_multi_tpu.env import vec_env
    from mlp_ppo_2ply_multi_tpu.oracle.env import OracleEnv
    from mlp_ppo_2ply_multi_tpu.engine.movegen import board_take

    cfg = Config()
    B, T = 6, 50
    rng = np.random.default_rng(5)
    nd = vec_env._ND_PAIRS
    opener = nd[rng.integers(0, 30, size=B)]
    first = nd[rng.integers(0, 30, size=B)]
    dice = rng.integers(1, 7, size=(T, B, 2)).astype(np.int32)

    @jax.jit
    def jit_step(state, action, next_dice):
        moves = MG2.legal_moves(state.board, state.player, state.dice, cfg.movegen)
        chosen = board_take(moves.boards, action[..., None])
        res = vec_env.step(state, moves, action, next_dice, cfg.env)
        return moves.count, chosen, res

    state = vec_env.reset_from_rolls(jnp.asarray(opener), jnp.asarray(first))
    envs = [
        OracleEnv(iter([tuple(opener[g]), tuple(first[g])] + [tuple(d) for d in dice[:, g]]))
        for g in range(B)
    ]
    for e in envs:
        e.reset()
    done = [False] * B

    for t in range(T):
        counts = [0 if done[g] else envs[g].num_moves for g in range(B)]
        actions = [(t * 7 + 3 * g) % c if c else 0 for g, c in enumerate(counts)]
        j_counts, chosen, res = jit_step(
            state, jnp.asarray(actions, jnp.int32), jnp.asarray(dice[t])
        )
        j_counts = np.asarray(j_counts)
        for g in range(B):
            if done[g]:
                continue
            assert j_counts[g] == counts[g], (t, g)
            if counts[g] == 0:
                envs[g].step(None)
            else:
                got_b = jax_board_to_tuple(type(chosen)(chosen.data[..., 0, :]), g)
                # find the oracle action with the same afterstate
                matches = [k for k, (_, b) in enumerate(envs[g].legal) if b == got_b]
                assert matches, (t, g, "chosen board not in oracle set")
                _, r, d, _ = envs[g].step(matches[0])
                assert np.isclose(float(np.asarray(res.reward)[g]), r), (t, g)
                if d:
                    done[g] = True
        state = res.state


def test_fast_preset_matches_oracle():
    """The production 'fast' width preset must still match the oracle on
    random positions (sets for doubles, order for non-doubles)."""
    fast = MoveGenConfig.fast()
    cfg = MoveGenConfig(
        algo="canonical", dd_subbatch_div=0,
        w1=fast.w1, w2=fast.w2, w3=fast.w3, w4=fast.w4,
        nd_dedup_k=fast.nd_dedup_k,
    )
    jf = jax.jit(lambda b, p, d: MG2.legal_moves(b, p, d, cfg))
    run_set_diff(jf, 777, 96, doubles_bias=0.4)
    run_order_diff(jf, 778, 96, doubles_bias=0.0)


def test_blocked_select_matches_flat():
    """_select_set_bits_fast / _select_set_bits_blocked == the flat
    compare-reduce on random masks across every shape used by the engine."""
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(123)
    for n, width in [(1512, 384), (448, 448), (2592, 224), (6048, 448), (96, 448)]:
        for _ in range(3):
            v = jnp.asarray(rng.random((5, n)) < rng.uniform(0.01, 0.6))
            i0, o0 = MG2._select_set_bits(v, width)
            i1, o1 = MG2._select_set_bits_fast(v, width)
            assert bool(jnp.all(o0 == o1))
            assert bool(jnp.all(jnp.where(o0, i0, 0) == jnp.where(o1, i1, 0)))


@pytest.mark.slow
def test_nd_tier_matches_full():
    """The two-tier nd tail (nd_tier > 0) must produce identical move sets
    to the single full-width pass on a mixed batch. tier=8 is far below the
    typical candidate count, so both tiers (exact narrow tail and the
    wide-game sub-batch) are exercised; wide_div=1 sizes the sub-batch to
    the whole batch so nothing is ever truncated."""
    rng = random.Random(991)
    from mlp_ppo_2ply_multi_tpu.oracle import sampling

    n = 128
    boards = [sampling.random_board(rng) for _ in range(n)]
    players = [rng.randint(0, 1) for _ in range(n)]
    # non-doubles only: the tier only affects enumerate_nondoubles
    dice = []
    for _ in range(n):
        a, b = rng.randint(1, 6), rng.randint(1, 6)
        while a == b:
            a, b = rng.randint(1, 6), rng.randint(1, 6)
        dice.append((a, b))
    jb = boards_to_jax(boards)
    pl = jnp.asarray(players, jnp.int32)
    dc = jnp.asarray(dice, jnp.int32)
    cfg_tier = MoveGenConfig(
        algo="canonical", dd_subbatch_div=0, nd_tier=8, nd_wide_div=1
    )
    ms_t = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: MG2.legal_moves(b, p, d, cfg_tier))(jb, pl, dc))
    ms_f = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: MG2.legal_moves(b, p, d, CFG))(jb, pl, dc))
    np.testing.assert_array_equal(ms_t.count, ms_f.count)
    np.testing.assert_array_equal(ms_t.valid, ms_f.valid)
    assert not ms_t.overflow.any()
    for g in range(n):
        for k in range(int(ms_f.count[g])):
            assert jax_board_to_tuple(ms_t.boards, g, k) == jax_board_to_tuple(
                ms_f.boards, g, k
            ), (g, k)


@pytest.mark.slow
def test_nd_tier_overflow_fallback():
    """A wide game that misses the sub-batch must keep its tier-width result
    (exact first-T raw candidates through the tail) and raise
    MoveSet.overflow (surfaced truncation); games that fit the tier or the
    sub-batch must match the full-width pass exactly."""
    rng = random.Random(992)
    from mlp_ppo_2ply_multi_tpu.oracle import sampling

    n = 64
    boards = [sampling.random_board(rng) for _ in range(n)]
    players = [rng.randint(0, 1) for _ in range(n)]
    dice = [(1, 2)] * n
    jb = boards_to_jax(boards)
    pl = jnp.asarray(players, jnp.int32)
    dc = jnp.asarray(dice, jnp.int32)
    # tier=2 makes nearly every game "wide"; div forces wn=8 << #wide games
    cfg_tier = MoveGenConfig(
        algo="canonical", dd_subbatch_div=0, nd_tier=2, nd_wide_div=64
    )
    ms_t = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: MG2.legal_moves(b, p, d, cfg_tier))(jb, pl, dc))
    ms_f = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: MG2.legal_moves(b, p, d, CFG))(jb, pl, dc))
    n_dropped = int(ms_t.overflow.sum())
    assert n_dropped > 0, "fixture must overflow the sub-batch"
    for g in range(n):
        if not ms_t.overflow[g]:
            assert int(ms_t.count[g]) == int(ms_f.count[g])
            for k in range(int(ms_f.count[g])):
                assert jax_board_to_tuple(ms_t.boards, g, k) == jax_board_to_tuple(
                    ms_f.boards, g, k
                ), (g, k)
        else:
            # tier-width fallback: at most T survivors, never inflated
            # beyond the full set
            assert int(ms_t.count[g]) <= 2


@pytest.mark.slow
def test_dd_tier_matches_full():
    """The two-tier doubles expansion (dd_tier non-empty) must produce
    identical move sets to the full-width chain. Narrow widths (8, 8, 8)
    sit far below the level maxima so both tiers are exercised;
    dd_wide_div=1 sizes the sub-sub-batch to the whole doubles sub-batch so
    nothing is ever truncated. n=128 > 64 engages the sub-batch path in
    both configs (dd_subbatch_div=1: every game gets a slot)."""
    rng = random.Random(993)
    from mlp_ppo_2ply_multi_tpu.oracle import sampling

    n = 128
    boards = [sampling.random_board(rng) for _ in range(n)]
    players = [rng.randint(0, 1) for _ in range(n)]
    # ~1/2 doubles so the sub-batch fills both board kinds
    dice = []
    for _ in range(n):
        if rng.random() < 0.5:
            d = rng.randint(1, 6)
            dice.append((d, d))
        else:
            a, b = rng.randint(1, 6), rng.randint(1, 6)
            while a == b:
                a, b = rng.randint(1, 6), rng.randint(1, 6)
            dice.append((a, b))
    jb = boards_to_jax(boards)
    pl = jnp.asarray(players, jnp.int32)
    dc = jnp.asarray(dice, jnp.int32)
    cfg_full = MoveGenConfig(algo="canonical", dd_subbatch_div=1)
    cfg_tier = MoveGenConfig(
        algo="canonical", dd_subbatch_div=1, dd_tier=(8, 8, 8), dd_wide_div=1
    )
    ms_t = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: MG2.legal_moves(b, p, d, cfg_tier))(jb, pl, dc))
    ms_f = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: MG2.legal_moves(b, p, d, cfg_full))(jb, pl, dc))
    np.testing.assert_array_equal(ms_t.count, ms_f.count)
    for g in range(n):
        # identical surviving boards in identical slot order (both runs use
        # the canonical chain; tier-2 games re-run the full-width chain)
        vt = np.flatnonzero(ms_t.valid[g])
        vf = np.flatnonzero(ms_f.valid[g])
        assert len(vt) == len(vf), g
        for kt, kf in zip(vt, vf):
            assert jax_board_to_tuple(ms_t.boards, g, int(kt)) == (
                jax_board_to_tuple(ms_f.boards, g, int(kf))
            ), (g, kt, kf)


@pytest.mark.slow
def test_dd_tier_overflow_fallback():
    """A doubles game that overflows the narrow widths AND misses the
    sub-sub-batch keeps its narrow-width result and stays overflow-flagged;
    games that fit either tier must match the full-width chain."""
    rng = random.Random(994)
    from mlp_ppo_2ply_multi_tpu.oracle import sampling

    n = 128
    boards = [sampling.random_board(rng) for _ in range(n)]
    players = [rng.randint(0, 1) for _ in range(n)]
    dice = [(rng.randint(1, 6),) * 2 for _ in range(n)]  # all doubles
    jb = boards_to_jax(boards)
    pl = jnp.asarray(players, jnp.int32)
    dc = jnp.asarray(dice, jnp.int32)
    cfg_full = MoveGenConfig(algo="canonical", dd_subbatch_div=1)
    # (2, 2, 2) makes most games wide; div=256 -> wn=8 << #wide games
    cfg_tier = MoveGenConfig(
        algo="canonical", dd_subbatch_div=1, dd_tier=(2, 2, 2), dd_wide_div=256
    )
    ms_t = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: MG2.legal_moves(b, p, d, cfg_tier))(jb, pl, dc))
    ms_f = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: MG2.legal_moves(b, p, d, cfg_full))(jb, pl, dc))
    assert int(ms_t.overflow.sum()) > 0, "fixture must overflow the sub-sub-batch"
    n_exact = 0
    for g in range(n):
        if not ms_t.overflow[g]:
            n_exact += 1
            assert int(ms_t.count[g]) == int(ms_f.count[g]), g
            vt = np.flatnonzero(ms_t.valid[g])
            vf = np.flatnonzero(ms_f.valid[g])
            for kt, kf in zip(vt, vf):
                assert jax_board_to_tuple(ms_t.boards, g, int(kt)) == (
                    jax_board_to_tuple(ms_f.boards, g, int(kf))
                ), (g, kt, kf)
        else:
            # narrow fallback: never more survivors than the full set
            assert int(ms_t.count[g]) <= int(ms_f.count[g]), g
    assert n_exact > 0


def _tiered_game_survivors(ti, g):
    """Presented boards of game g from a Tiered set, in order."""
    if ti.in_wide[g]:
        row = int(ti.wide_slot[g])
        return [
            jax_board_to_tuple(ti.wide.boards, row, int(k))
            for k in np.flatnonzero(ti.wide.valid[row])
        ]
    return [
        jax_board_to_tuple(ti.narrow_boards, g, int(k))
        for k in np.flatnonzero(ti.narrow_valid[g])
    ]


@pytest.mark.slow
def test_tiered_matches_legal_moves():
    """legal_moves_tiered must present, game for game, exactly the boards of
    the full-width canonical legal_moves in the same order. nd_tier=8 and
    dd_tier=(4,4,8) sit far below typical widths so BOTH planes carry real
    traffic; tiered_wide_div=1 sizes the wide plane to the whole batch so
    nothing is ever truncated."""
    rng = random.Random(995)
    from mlp_ppo_2ply_multi_tpu.oracle import sampling

    n = 128
    boards = [sampling.random_board(rng) for _ in range(n)]
    players = [rng.randint(0, 1) for _ in range(n)]
    dice = []
    for _ in range(n):
        if rng.random() < 0.4:
            d = rng.randint(1, 6)
            dice.append((d, d))
        else:
            a, b = rng.randint(1, 6), rng.randint(1, 6)
            while a == b:
                a, b = rng.randint(1, 6), rng.randint(1, 6)
            dice.append((a, b))
    jb = boards_to_jax(boards)
    pl = jnp.asarray(players, jnp.int32)
    dc = jnp.asarray(dice, jnp.int32)

    cfg_t = MoveGenConfig(
        algo="canonical", dd_subbatch_div=4, nd_tier=8, dd_tier=(4, 4, 8),
        tiered=True, tiered_wide_div=1,
    )
    cfg_full = MoveGenConfig(algo="canonical", dd_subbatch_div=0)
    ti = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: XT.legal_moves_tiered(b, p, d, cfg_t))(jb, pl, dc))
    ms = jax.tree.map(np.asarray, jax.jit(
        lambda b, p, d: MG2.legal_moves(b, p, d, cfg_full))(jb, pl, dc))

    assert not ti.overflow.any()
    np.testing.assert_array_equal(ti.count, ms.count)
    for g in range(n):
        want = [
            jax_board_to_tuple(ms.boards, g, int(k))
            for k in np.flatnonzero(ms.valid[g])
        ]
        got = _tiered_game_survivors(ti, g)
        assert got == want, g


@pytest.mark.slow
def test_tiered_rollout_step_runs():
    """One tiered-pipeline rollout_step executes on CPU and reports sane
    counts (smoke; numeric behavior is covered by the plane-equivalence
    test and the actor's own tests)."""
    from mlp_ppo_2ply_multi_tpu.core.config import Config, ModelConfig
    from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
    from mlp_ppo_2ply_multi_tpu.env import vec_env
    from mlp_ppo_2ply_multi_tpu.learner import td

    cfg = Config(
        movegen=MoveGenConfig(
            algo="canonical", w1=16, w2=32, w3=48, w4=64, a_max=64,
            nd_dedup_k=64, dd_subbatch_div=4, nd_tier=16, dd_tier=(8, 8, 16),
            tiered=True, tiered_wide_div=2,
        ),
        model=ModelConfig(fused_actor_kernel=True),
    )
    key = jax.random.PRNGKey(3)
    params = td.init_train_state(key, cfg).params
    state = vec_env.reset(jax.random.fold_in(key, 1), 128)
    new_state, t = jax.jit(
        lambda p, s, k: actor.rollout_step(
            p, s, k, jnp.float32(1.0), cfg, True
        )
    )(params, state, jax.random.fold_in(key, 2))
    nm = np.asarray(t.num_moves)
    assert nm.min() >= 0 and nm.max() <= 64
    assert bool(np.asarray(t.recorded).any())
