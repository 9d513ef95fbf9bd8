"""Batched, jittable backgammon environment.

Replaces the reference's per-process gym env
(/root/reference/src/environments/backgammon_env.py) with one SPMD program
stepping B games in lockstep. Dice come from JAX counter-based PRNG keys
passed explicitly, so trajectories are reproducible and dice are injectable
for differential tests (quirk Q15).

Semantics preserved (file:line in the reference):
  * opening procedure backgammon_env.py:92-128 (Q5) — a non-doubles roll
    decides the starter, a fresh non-doubles roll plays the first move. The
    rejection loops are replaced by a single uniform draw over the 30 ordered
    non-double pairs (identical distribution, no data-dependent looping).
  * auto-pass on zero legal moves :139-151 (reward 0, turn flips, new roll).
  * invalid action -> -1 reward, state unchanged :153-158 (Q8).
  * win typing :167-193 (backgammon 2.5 > gammon 2.0 > regular 1.0, Q10).
  * one-time close-out/five-prime shaping per player per game :196-213.
  * 300-step truncation is the caller's job (worker.py:101), surfaced here
    via step_count.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import EnvConfig
from mlp_ppo_2ply_multi_tpu.engine import board as B
from mlp_ppo_2ply_multi_tpu.engine.board import Board
from mlp_ppo_2ply_multi_tpu.engine.movegen import MoveSet, board_take_onehot


class EnvState(NamedTuple):
    board: Board  # [B]
    player: jax.Array  # int32[B] side to move
    dice: jax.Array  # int32[B, 2]
    game_over: jax.Array  # bool[B]
    win_type: jax.Array  # int8[B]: 0 none / 1 regular / 2 gammon / 3 backgammon
    close_out_given: jax.Array  # bool[B, 2]
    prime_given: jax.Array  # bool[B, 2]
    step_count: jax.Array  # int32[B] env steps taken this episode (incl. passes)


class StepResult(NamedTuple):
    state: EnvState
    reward: jax.Array  # float32[B], from the mover's perspective (Q3/Q10)
    done: jax.Array  # bool[B] game ended on this step
    recorded: jax.Array  # bool[B] a decision was made (exp recorded, worker.py:148)
    passed: jax.Array  # bool[B] auto-pass happened
    win_type: jax.Array  # int8[B] (nonzero only where done just became True)
    close_out_bonus: jax.Array  # bool[B]
    prime_bonus: jax.Array  # bool[B]


# The 30 ordered non-double dice pairs — sampling an index uniformly is
# distribution-identical to the reference's roll-until-not-doubles loop.
_ND_PAIRS = np.asarray(
    [(i, j) for i in range(1, 7) for j in range(1, 7) if i != j], dtype=np.int32
)


def roll_nondouble(key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    idx = jax.random.randint(key, shape, 0, 30)
    return jnp.take(jnp.asarray(_ND_PAIRS), idx, axis=0)


def roll_dice(key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    return jax.random.randint(key, (*shape, 2), 1, 7)


def reset(key: jax.Array, batch: int) -> EnvState:
    """Fresh episodes for the whole batch (reference backgammon_env.py:92-128)."""
    k_start, k_first = jax.random.split(key)
    opener = roll_nondouble(k_start, (batch,))
    player = jnp.where(opener[..., 0] < opener[..., 1], 1, 0).astype(jnp.int32)
    dice = roll_nondouble(k_first, (batch,))
    return EnvState(
        board=B.initial_board((batch,)),
        player=player,
        dice=dice,
        game_over=jnp.zeros((batch,), bool),
        win_type=jnp.zeros((batch,), jnp.int8),
        close_out_given=jnp.zeros((batch, 2), bool),
        prime_given=jnp.zeros((batch, 2), bool),
        step_count=jnp.zeros((batch,), jnp.int32),
    )


def reset_from_rolls(opener: jax.Array, first: jax.Array) -> EnvState:
    """Fresh episodes with injected opening rolls (both non-double int32[B,2]);
    the transcript-parity entry point (quirk Q15)."""
    batch = opener.shape[0]
    player = jnp.where(opener[..., 0] < opener[..., 1], 1, 0).astype(jnp.int32)
    return EnvState(
        board=B.initial_board((batch,)),
        player=player,
        dice=first.astype(jnp.int32),
        game_over=jnp.zeros((batch,), bool),
        win_type=jnp.zeros((batch,), jnp.int8),
        close_out_given=jnp.zeros((batch, 2), bool),
        prime_given=jnp.zeros((batch, 2), bool),
        step_count=jnp.zeros((batch,), jnp.int32),
    )


def reset_where(mask: jax.Array, state: EnvState, key: jax.Array) -> EnvState:
    """Re-initialize only the masked games (continuous rollout mode)."""
    fresh = reset(key, state.player.shape[0])
    sel = lambda a, b: jnp.where(mask.reshape(mask.shape + (1,) * (a.ndim - 1)), a, b)
    return EnvState(
        board=Board(data=sel(fresh.board.data, state.board.data)),
        player=sel(fresh.player, state.player),
        dice=sel(fresh.dice, state.dice),
        game_over=sel(fresh.game_over, state.game_over),
        win_type=sel(fresh.win_type, state.win_type),
        close_out_given=sel(fresh.close_out_given, state.close_out_given),
        prime_given=sel(fresh.prime_given, state.prime_given),
        step_count=sel(fresh.step_count, state.step_count),
    )


def step(
    state: EnvState,
    moves: MoveSet,
    action: jax.Array,
    next_dice: jax.Array,
    cfg: EnvConfig,
) -> StepResult:
    """One lockstep env transition for the whole batch.

    ``moves`` must be legal_moves(state.board, state.player, state.dice);
    ``action`` indexes its entry axis (ignored where count == 0).
    ``next_dice`` int32[B, 2] is adopted by games whose turn advances —
    passing dice explicitly (rather than a PRNG key) keeps the env
    deterministic under injected dice streams (quirk Q15). Games already
    over or truncated (step_count >= max_timesteps) freeze.
    """
    a = jnp.clip(action, 0, moves.valid.shape[-1] - 1)
    # one-hot matmul take: a row gather here forced a [B, A, 52] layout copy
    # (~0.65ms at B=4096, A=448) plus a slow gather; the one-hot einsum rides
    # the MXU and fuses with the producer's layout (PERF.md round 2)
    chosen = board_take_onehot(moves.boards, a[..., None])
    chosen = Board(data=chosen.data[..., 0, :])
    return step_chosen(state, moves.count, chosen, next_dice, cfg)


def step_chosen(
    state: EnvState,
    count: jax.Array,
    chosen: Board,
    next_dice: jax.Array,
    cfg: EnvConfig,
) -> StepResult:
    """``step`` with the selected afterstate supplied directly.

    The tiered actor pipeline (experimental.tiered.legal_moves_tiered) samples its move
    per plane and takes the chosen board there, so the merged [B, A, 52]
    move tensor never has to exist; the env only needs the legal-move count
    (pass detection, backgammon_env.py:130-140) and the board the mover
    chose. ``chosen`` is ignored where count == 0."""
    p = state.player
    live = ~state.game_over & (state.step_count < cfg.max_timesteps)
    passing = live & (count == 0)
    acting = live & (count > 0)

    new_board = Board(
        data=jnp.where(acting[..., None], chosen.data, state.board.data)
    )

    won = B.has_won(new_board, p) & acting
    bg = won & B.is_backgammon(new_board, p)
    gam = won & ~bg & B.is_gammon(new_board, p)
    reg = won & ~bg & ~gam
    win_type_now = (
        reg.astype(jnp.int8) * 1 + gam.astype(jnp.int8) * 2 + bg.astype(jnp.int8) * 3
    )
    reward = (
        reg * cfg.reward_win_normal
        + gam * cfg.reward_win_gammon
        + bg * cfg.reward_win_backgammon
    ).astype(jnp.float32)

    # one-time shaping (backgammon_env.py:196-213)
    given_c = jnp.take_along_axis(state.close_out_given, p[..., None], -1)[..., 0]
    given_p = jnp.take_along_axis(state.prime_given, p[..., None], -1)[..., 0]
    closeout = acting & ~won & B.is_closed_out(new_board, p) & ~given_c
    prime = acting & ~won & B.has_five_prime(new_board, p) & ~given_p
    if cfg.shaping_rewards:
        reward = reward + closeout * cfg.reward_close_out + prime * cfg.reward_five_prime
        p_oh = jax.nn.one_hot(p, 2, dtype=bool)
        new_cg = state.close_out_given | (p_oh & closeout[..., None])
        new_pg = state.prime_given | (p_oh & prime[..., None])
    else:
        closeout = jnp.zeros_like(closeout)
        prime = jnp.zeros_like(prime)
        new_cg, new_pg = state.close_out_given, state.prime_given

    # turn flip + fresh roll for acting (not won) and passing games
    advance = passing | (acting & ~won)
    new_player = jnp.where(advance, 1 - p, p)
    new_dice = jnp.where(advance[..., None], next_dice, state.dice)

    new_state = EnvState(
        board=new_board,
        player=new_player,
        dice=new_dice,
        game_over=state.game_over | won,
        win_type=jnp.where(won, win_type_now, state.win_type),
        close_out_given=new_cg,
        prime_given=new_pg,
        step_count=state.step_count + (acting | passing).astype(jnp.int32),
    )
    return StepResult(
        state=new_state,
        reward=reward,
        done=won,
        recorded=acting,
        passed=passing,
        win_type=win_type_now,
        close_out_bonus=closeout,
        prime_bonus=prime,
    )
