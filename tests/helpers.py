"""Shared helpers for differential tests between the JAX engine and the
pure-python oracle."""
from __future__ import annotations

import random
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.engine.board import Board
from mlp_ppo_2ply_multi_tpu.oracle.rules import BoardT


def boards_to_jax(boards: Sequence[BoardT]) -> Board:
    data = np.array(
        [list(b[0]) + list(b[1]) + list(b[2]) + list(b[3]) for b in boards],
        dtype=np.int8,
    )
    return Board(data=jnp.asarray(data))


def jax_board_to_tuple(b, g: int, k: int = None) -> BoardT:
    """Extract game g (and entry k if given) as an oracle board tuple."""
    d = np.asarray(b.data)
    d = d[g, k] if k is not None else d[g]
    return (
        tuple(int(x) for x in d[0:24]),
        tuple(int(x) for x in d[24:48]),
        (int(d[48]), int(d[49])),
        (int(d[50]), int(d[51])),
    )


def blocked_doubles_case(rng: random.Random):
    """Construct (board, player, die) aimed at NO-4-MOVE doubles positions —
    the only reachable class where the forced-shorter rule's path dependence
    in the reference (handle_move_types.py) could diverge from our
    order-independent formulation (PARITY.md divergence 3). The mover's
    chain landing points for die d are mostly opponent-made; ~18% of draws
    yield a position whose longest playable doubles sequence is 1-3 submoves.
    """
    p = rng.randint(0, 1)
    d = rng.randint(1, 6)
    opp = 1 - p
    pts = [[0] * 24, [0] * 24]
    bar = [0, 0]
    off = [0, 0]
    sign = 1 if p == 0 else -1
    n = 15
    if rng.random() < 0.4:
        bar[p] = rng.randint(1, 3)
        n -= bar[p]
    own_pts = rng.sample(range(24), rng.randint(2, 5))
    for i, s in enumerate(own_pts):
        k = min(n, rng.randint(1, 6)) if i < len(own_pts) - 1 else n
        pts[p][s] += k
        n -= k
        if n == 0:
            break
    if n:
        pts[p][own_pts[0]] += n
    m = 15
    landings = []
    for s in range(24):
        if pts[p][s]:
            for j in (1, 2, 3):
                t = s + sign * j * d
                if 0 <= t < 24 and pts[p][t] == 0:
                    landings.append(t)
    if bar[p]:
        entry = (d - 1) if p == 0 else (24 - d)
        for e in range(6):
            t = e if p == 0 else 23 - e
            if t != entry and pts[p][t] == 0 and rng.random() < 0.85 and m >= 2:
                pts[opp][t] += 2
                m -= 2
        for j in (1, 2):
            t = entry + sign * j * d
            if 0 <= t < 24 and pts[p][t] == 0:
                landings.append(t)
    rng.shuffle(landings)
    for t in landings:
        if pts[opp][t] == 0 and m >= 2 and rng.random() < 0.85:
            pts[opp][t] += 2
            m -= 2
    spots = [i for i in range(24) if pts[p][i] == 0 and pts[opp][i] == 0]
    rng.shuffle(spots)
    for t in spots:
        if m == 0:
            break
        k = min(m, rng.randint(1, 4))
        pts[opp][t] += k
        m -= k
    off[opp] += m
    return (tuple(pts[0]), tuple(pts[1]), tuple(bar), tuple(off)), p, d


def bearoff_doubles_case(rng: random.Random):
    """Bear-off-corner family: 1-3 mover checkers left in the home board
    (rest borne off), optional opponent contact inside the home — exercises
    the exact/overage bear-off slots and farthest-point enabling chains that
    the blocking family never reaches."""
    p = rng.randint(0, 1)
    d = rng.randint(1, 6)
    opp = 1 - p
    pts = [[0] * 24, [0] * 24]
    bar = [0, 0]
    off = [0, 0]
    home = list(range(18, 24)) if p == 0 else list(range(0, 6))
    k = rng.randint(1, 3)
    for _ in range(k):
        pts[p][rng.choice(home)] += 1
    off[p] = 15 - k
    m = 15
    if rng.random() < 0.6:
        free = [i for i in home if pts[p][i] == 0]
        if free:
            t = rng.choice(free)
            c = rng.choice([1, 2])
            pts[opp][t] += c
            m -= c
    away = [
        i for i in range(24)
        if i not in home and pts[p][i] == 0 and pts[opp][i] == 0
    ]
    rng.shuffle(away)
    for t in away:
        if m == 0:
            break
        c = min(m, rng.randint(1, 5))
        pts[opp][t] += c
        m -= c
    off[opp] += m
    return (tuple(pts[0]), tuple(pts[1]), tuple(bar), tuple(off)), p, d


def collect_no4move_doubles(seed: int, n: int, max_draws: int = None):
    """Rejection-sample ``n`` decisions (board, player, die) whose doubles
    move set is non-empty with longest sequence < 4 submoves. Draws
    alternate between the blocked-chain family and the bear-off family.

    Empirical + structural note: every such decision has exactly ONE
    presented move. With a single die value each checker position has at
    most one destination (normal, exact bear-off, and overage bear-off are
    mutually exclusive per origin), opponent material is static during the
    turn, and playing a submove only ever ENABLES other submoves (home
    entry -> bear-off eligibility, farthest-point succession) — so every
    maximal sequence plays the same submove multiset and reaches the same
    afterstate (confluence). The reference's path-dependent forced-shorter
    recursion therefore has no room to diverge in this class; the 10k-case
    sweep (scripts/adversarial_doubles_sweep.py) confirms count/order/
    afterstate equality case-for-case."""
    from mlp_ppo_2ply_multi_tpu.oracle import rules

    rng = random.Random(seed)
    out = []
    draws = 0
    cap = max_draws or n * 40
    gens = (blocked_doubles_case, bearoff_doubles_case)
    while len(out) < n and draws < cap:
        b, p, d = gens[draws % 2](rng)
        draws += 1
        mvs = rules.full_moves(b, p, [d, d])
        if mvs and max(len(mv[0]) for mv in mvs) < 4:
            out.append((b, p, d))
    return out


def sample_cases(
    seed: int, n: int, doubles_bias: float = 0.4
) -> Tuple[List[BoardT], List[int], List[Tuple[int, int]]]:
    from mlp_ppo_2ply_multi_tpu.oracle import sampling

    rng = random.Random(seed)
    boards, players, dice = [], [], []
    for _ in range(n):
        boards.append(sampling.random_board(rng))
        players.append(rng.randint(0, 1))
        dice.append(sampling.random_roll(rng, doubles_bias=doubles_bias))
    return boards, players, dice
