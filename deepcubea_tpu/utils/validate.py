"""Solution validation by replay — the reference's de-facto correctness
oracle (utils/search_utils.py:7-13, asserted at astar.py:443 and :556)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..envs.base import Environment


def is_valid_solution(env: Environment, state: np.ndarray,
                      moves: Sequence[int]) -> bool:
    """Replay `moves` from `state` (W,) and check the result is solved."""
    s = jnp.asarray(np.asarray(state)[None, :])
    for m in moves:
        s = env.step(s, jnp.asarray([int(m)], jnp.int32))
    return bool(np.asarray(env.is_solved(s))[0])


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
