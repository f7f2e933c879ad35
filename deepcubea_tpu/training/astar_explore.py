"""A*-based exploration labeling for AVI (reference updaters/updater.py:36-54).

Each training instance runs `num_steps` iterations of weighted A* with pop
batch 1 and a per-instance random weight in [0, 1); every POPPED node is
labeled with its one-step Bellman backup — min over children of
(tc + h_target(child)), 0 if the node is solved (astar.py:37-44
Node.compute_bellman) — and `is_solved` reports whether any popped node was
a goal (astar.py:319-325 has_found_goal).

Device design: a mini open list per instance as fixed arrays of capacity
1 + num_steps * A (each step consumes one node and appends A children), a
`lax.scan` over steps, argmin pop, everything batched over instances. The
reference's per-instance closed dict is intentionally omitted: these are
tiny exploratory searches where duplicate pops only re-label a state with
the same (correct) Bellman value.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..envs.base import Environment
from ..models.resnet import ResnetValueNet
from .heuristic import heuristic_values


class AStarExploreResult(NamedTuple):
    traj_states: jnp.ndarray  # (K, I, W) popped states
    traj_ctg: jnp.ndarray     # (K, I) Bellman labels
    traj_valid: jnp.ndarray   # (K, I) pop was real (open non-empty)
    is_solved: jnp.ndarray    # (I,) a goal node was popped


@partial(jax.jit, static_argnames=("env", "model", "num_steps"))
def astar_explore(env: Environment, model: ResnetValueNet, params,
                  batch_stats, states: jnp.ndarray, weights: jnp.ndarray,
                  num_steps: int) -> AStarExploreResult:
    i, w = states.shape
    a = env.num_actions
    c = 1 + num_steps * a
    inf = jnp.float32(jnp.inf)

    open_states = jnp.zeros((i, c, w), states.dtype).at[:, 0, :].set(states)
    open_g = jnp.zeros((i, c), jnp.int32)
    open_f = jnp.full((i, c), inf).at[:, 0].set(0.0)

    rows = jnp.arange(i)

    def body(carry, step):
        o_states, o_g, o_f, found_goal = carry
        best = jnp.argmin(o_f, axis=1)                     # (I,)
        valid = jnp.isfinite(o_f[rows, best])
        pop_s = o_states[rows, best]                       # (I, W)
        pop_g = o_g[rows, best]
        o_f = o_f.at[rows, best].set(inf)

        pop_solved = env.is_solved(pop_s)
        found_goal = found_goal | (pop_solved & valid)

        children, tc = env.expand(pop_s)                   # (I, A, W)
        flat = children.reshape(i * a, w)
        h = heuristic_values(env, model, params, batch_stats, flat,
                             clip_zero=True).reshape(i, a)
        child_costs = tc + h
        # Bellman label of the popped node (astar.py:37-44)
        label = jnp.min(child_costs, axis=1) * (1.0 - pop_solved.astype(jnp.float32))

        solved_ch = env.is_solved(flat).reshape(i, a)
        child_g = (pop_g + 1).astype(jnp.float32)
        child_f = (weights[:, None] * child_g[:, None]
                   + h * (1.0 - solved_ch.astype(jnp.float32)))
        # children of an empty-open (invalid) pop never enter the list; the
        # reference expands even goal pops (astar.py:266-291), so we do too
        child_f = jnp.where(valid[:, None], child_f, inf)

        base = 1 + step * a
        slots = base + jnp.arange(a)
        o_states = o_states.at[:, slots, :].set(children)
        o_g = o_g.at[:, slots].set(pop_g[:, None] + 1)
        o_f = o_f.at[:, slots].set(child_f)

        # every real pop is a labeled sample (updater.py:42-50 labels all
        # popped nodes, goal or not)
        out = (pop_s, label, valid)
        return (o_states, o_g, o_f, found_goal), out

    init = (open_states, open_g, open_f, jnp.zeros((i,), bool))
    (_, _, _, found_goal), (t_states, t_ctg, t_valid) = jax.lax.scan(
        body, init, jnp.arange(num_steps))
    return AStarExploreResult(t_states, t_ctg, t_valid, found_goal)
