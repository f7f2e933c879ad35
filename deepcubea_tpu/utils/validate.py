"""Solution validation by replay — the reference's de-facto correctness
oracle (utils/search_utils.py:7-13, asserted at astar.py:443 and :556)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.base import Environment

# one jitted scan per (env, padded-length bucket); see replay_states
_REPLAY_CACHE: dict = {}


def replay_states(env: Environment, state: np.ndarray,
                  moves: Sequence[int]) -> np.ndarray:
    """(L, W) states after each of `moves` from `state` — ONE device
    dispatch. The per-move env.step loop this replaces costs 1-2 tunnel
    round-trips PER MOVE on a remote-device client (~50-100 ms each), so
    every solved state paid seconds of serialized replay on the solve
    stream's finish path (measured r5: the sokoban campaign's ~6 s/state
    refill stall). Moves are padded to power-of-two buckets so a handful
    of scan compiles serve all solution lengths; padding actions are -1
    and leave the state unchanged inside the scan."""
    moves = [int(m) for m in moves]
    for m in moves:
        # env.step's one-hot/mask kernels silently corrupt the state for
        # out-of-range ids; guard where host-side move lists circulate
        assert 0 <= m < env.num_actions, f"invalid move id {m}"
    L = len(moves)
    if L == 0:
        return np.asarray(state)[None][:0]
    cap = max(32, 1 << (L - 1).bit_length())
    key = (id(env), cap)
    fn = _REPLAY_CACHE.get(key)
    if fn is None:
        def replay(s0, acts):
            def body(s, a):
                ns = env.step(s[None, :], a[None].astype(jnp.int32))[0]
                ns = jnp.where(a >= 0, ns, s)
                return ns, ns
            return jax.lax.scan(body, s0, acts)[1]

        fn = jax.jit(replay)
        _REPLAY_CACHE[key] = fn
    acts = np.full((cap,), -1, np.int32)
    acts[:L] = moves
    out = np.asarray(fn(jnp.asarray(np.asarray(state)), jnp.asarray(acts)))
    return out[:L]


def is_valid_solution(env: Environment, state: np.ndarray,
                      moves: Sequence[int]) -> bool:
    """Replay `moves` from `state` (W,) and check the result is solved."""
    if len(moves) == 0:
        last = np.asarray(state)
    else:
        last = replay_states(env, state, moves)[-1]
    return bool(np.asarray(env.is_solved(jnp.asarray(last[None, :])))[0])


def bfs_distances(env: Environment, max_nodes: int = 100_000) -> dict:
    """Exact goal distances by brute-force BFS over the reachable space of a
    SMALL domain; the ground-truth oracle for search tests (SURVEY.md §4)."""
    goal = np.asarray(env.goal_states(1))[0]
    dist = {goal.tobytes(): 0}
    frontier = [goal]
    while frontier and len(dist) < max_nodes:
        batch = np.stack(frontier)
        frontier = []
        children, _ = env.expand(jnp.asarray(batch))
        children = np.asarray(children)
        base = np.array([dist[s.tobytes()] for s in batch])
        for i in range(children.shape[0]):
            for a_idx in range(children.shape[1]):
                key = children[i, a_idx].tobytes()
                if key not in dist:
                    dist[key] = int(base[i]) + 1
                    frontier.append(children[i, a_idx])
    return dist
