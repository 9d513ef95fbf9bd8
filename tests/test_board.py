"""Board primitives vs the oracle: initial position, submove application,
predicates, conservation invariant, and incremental hashing.

All oracle comparisons are batched into single jitted calls — eager per-case
dispatch is orders of magnitude slower on the CPU test mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.engine import board as B
from mlp_ppo_2ply_multi_tpu.oracle import rules
from tests.helpers import boards_to_jax, jax_board_to_tuple, sample_cases


def _submove_cases(n_boards=48, dice=(1, 3, 6)):
    """(board, player, submove) cases harvested from the oracle."""
    boards, players, _ = sample_cases(5, n_boards)
    cases = []
    for g in range(n_boards):
        for die in dice:
            for mv in rules.one_die_moves(boards[g], players[g], die):
                cases.append((boards[g], players[g], mv))
    return cases


def test_initial_board_matches_oracle():
    jb = B.initial_board((2,))
    assert jax_board_to_tuple(jb, 0) == rules.start_board()
    assert bool(B.checker_conservation_ok(jb)[0])


def test_apply_submove_matches_oracle():
    cases = _submove_cases()
    jb = boards_to_jax([c[0] for c in cases])
    p = jnp.asarray([c[1] for c in cases], dtype=jnp.int32)
    s = jnp.asarray([c[2][0] for c in cases], dtype=jnp.int32)
    e = jnp.asarray([c[2][1] for c in cases], dtype=jnp.int32)
    h = jnp.asarray([c[2][2] for c in cases])
    got = jax.jit(B.apply_submove)(jb, p, s, e, h, jnp.ones_like(h))
    noop = jax.jit(B.apply_submove)(jb, p, s, e, h, jnp.zeros_like(h))
    cons = np.asarray(B.checker_conservation_ok(got))
    for i, (ob, player, mv) in enumerate(cases):
        assert jax_board_to_tuple(got, i) == rules.apply_submove(ob, player, mv)
        assert jax_board_to_tuple(noop, i) == ob
        assert cons[i]


def test_predicates_match_oracle():
    boards, players, _ = sample_cases(11, 128)
    jb = boards_to_jax(boards)
    for player in (0, 1):
        p = jnp.full((len(boards),), player, dtype=jnp.int32)
        won = np.asarray(B.has_won(jb, p))
        home = np.asarray(B.all_checkers_home(jb, p))
        kind = np.asarray(B.board_state_kind(jb, p))
        closed = np.asarray(B.is_closed_out(jb, p))
        prime = np.asarray(B.has_five_prime(jb, p))
        gam = np.asarray(B.is_gammon(jb, p))
        bgam = np.asarray(B.is_backgammon(jb, p))
        for g, ob in enumerate(boards):
            assert won[g] == rules.won(ob, player)
            assert home[g] == rules.all_home(ob, player)
            want_kind = {"normal": 0, "bar": 1, "bearoff": 2, "over": 3}[
                rules.state_kind(ob, player)
            ]
            assert kind[g] == want_kind
            assert closed[g] == rules.closed_out(ob, player)
            assert prime[g] == rules.five_prime(ob, player), (g, ob)
            assert gam[g] == rules.gammon(ob, player)
            assert bgam[g] == rules.backgammon(ob, player)


def test_incremental_hash_equals_full_hash():
    cases = _submove_cases(n_boards=32, dice=(2, 5))
    jb = boards_to_jax([c[0] for c in cases])
    p = jnp.asarray([c[1] for c in cases], dtype=jnp.int32)
    s = jnp.asarray([c[2][0] for c in cases], dtype=jnp.int32)
    e = jnp.asarray([c[2][1] for c in cases], dtype=jnp.int32)
    h = jnp.asarray([c[2][2] for c in cases])

    @jax.jit
    def both(jb, p, s, e, h):
        h1, h2 = B.board_hash(jb)
        d1, d2 = B.submove_hash_delta(jb, p, s, e, h)
        child = B.apply_submove(jb, p, s, e, h, jnp.ones_like(h))
        c1, c2 = B.board_hash(child)
        return h1 + d1 - c1, h2 + d2 - c2

    r1, r2 = both(jb, p, s, e, h)
    assert not np.asarray(r1).any()
    assert not np.asarray(r2).any()


def test_pack_unpack_roundtrip():
    boards, _, _ = sample_cases(31, 16)
    jb = boards_to_jax(boards)
    rb = B.unpack_board(B.pack_board(jb))
    assert np.array_equal(np.asarray(rb.data), np.asarray(jb.data))
