"""A*-based exploration labeling for AVI (reference updaters/updater.py:36-54).

Each training instance runs `num_steps` iterations of weighted A* with pop
batch 1 and a per-instance random weight in [0, 1); every POPPED node is
labeled with its one-step Bellman backup — min over children of
(tc + h_target(child)), 0 if the node is solved (astar.py:37-44
Node.compute_bellman) — and `is_solved` reports whether any popped node was
a goal (astar.py:319-325 has_found_goal). An instance that pops a goal
retires: the goal pop is its last labeled sample (reference astar.py:262
excludes instances with goal_nodes from subsequent steps), so labeled data
concentrates on the roots the current value function cannot yet solve.

Device design: a mini open list per instance as fixed arrays of capacity
1 + num_steps * A (each step consumes one node and appends A children), a
`lax.scan` over steps, argmin pop, everything batched over instances.

The per-instance CLOSED SET (reference AStar.closed_dict, astar.py:78-90)
is load-bearing and kept: popped states' fingerprints accumulate in a
(num_steps,)-slot closed list; at pop time every open copy of the popped
state is killed, and newly expanded children matching a closed state never
enter the open list. Without it (round 2's first lightsout7 run), a search
under a heuristic with hallucinated low-value valleys re-pops the same few
noise-minimal states (~55 unique of 200 pops measured), the labeled data
degenerates to self-consistent valley states (states of true cost 20+
labeled ~8), and the value function permanently stalls — dedup forces the
search to drill THROUGH a valley to the floor where the Bellman backup
generates the correction signal. The reference's reopen-if-shallower is
dropped: labels don't depend on g, and with unit costs the first pop is
near-minimal anyway.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..envs.base import Environment, fingerprint, fingerprint_constants
from ..models.resnet import ResnetValueNet
from .heuristic import heuristic_values


class AStarExploreResult(NamedTuple):
    traj_states: jnp.ndarray  # (K, I, W) popped states
    traj_ctg: jnp.ndarray     # (K, I) Bellman labels
    traj_valid: jnp.ndarray   # (K, I) pop was real and instance not retired
    is_solved: jnp.ndarray    # (I,) a goal node was popped


@partial(jax.jit, static_argnames=("env", "model", "num_steps"))
def astar_explore(env: Environment, model: ResnetValueNet, params,
                  batch_stats, states: jnp.ndarray, weights: jnp.ndarray,
                  num_steps: int, sel_params=None,
                  sel_stats=None) -> AStarExploreResult:
    """With `sel_params` (double-Q labeling, see gbfs.bellman_backup): the
    label's argmin child is selected by the current net and evaluated by
    the target net; search guidance (child_f) stays on the target net."""
    i, w = states.shape
    a = env.num_actions
    c = 1 + num_steps * a
    inf = jnp.float32(jnp.inf)
    sent = jnp.uint32(0xFFFFFFFF)
    consts = fingerprint_constants(env.state_width)

    open_states = jnp.zeros((i, c, w), states.dtype).at[:, 0, :].set(states)
    open_g = jnp.zeros((i, c), jnp.int32)
    open_f = jnp.full((i, c), inf).at[:, 0].set(0.0)
    root_fp0, root_fp1 = fingerprint(states, consts)
    open_fp0 = jnp.full((i, c), sent).at[:, 0].set(root_fp0)
    open_fp1 = jnp.full((i, c), sent).at[:, 0].set(root_fp1)
    closed_fp0 = jnp.full((i, num_steps), sent)
    closed_fp1 = jnp.full((i, num_steps), sent)

    rows = jnp.arange(i)

    def body(carry, step):
        (o_states, o_g, o_f, o_fp0, o_fp1, c_fp0, c_fp1, found_goal) = carry
        best = jnp.argmin(o_f, axis=1)                     # (I,)
        # an instance retires once it pops a goal (reference astar.py:262
        # filters instances with goal_nodes out of every later step): the
        # goal pop itself is labeled 0, everything after is masked out.
        # Without this, solved instances keep popping near-goal states for
        # the rest of the run and trivial labels crowd out the deep states
        # the value function still has to learn (measured on lightsout5:
        # 47% of labels had optimal cost <= 2).
        valid = jnp.isfinite(o_f[rows, best]) & ~found_goal
        pop_s = o_states[rows, best]                       # (I, W)
        pop_g = o_g[rows, best]
        pop_fp0 = o_fp0[rows, best]
        pop_fp1 = o_fp1[rows, best]

        # close the popped state: kill every open copy (the popped slot
        # included) and record its fingerprint (closed_dict, astar.py:78-90)
        same = ((o_fp0 == pop_fp0[:, None]) & (o_fp1 == pop_fp1[:, None])
                & valid[:, None])
        o_f = jnp.where(same, inf, o_f)
        o_f = o_f.at[rows, best].set(inf)
        c_fp0 = c_fp0.at[:, step].set(jnp.where(valid, pop_fp0, sent))
        c_fp1 = c_fp1.at[:, step].set(jnp.where(valid, pop_fp1, sent))

        pop_solved = env.is_solved(pop_s)
        found_goal = found_goal | (pop_solved & valid)

        children, tc = env.expand(pop_s)                   # (I, A, W)
        flat = children.reshape(i * a, w)
        h = heuristic_values(env, model, params, batch_stats, flat,
                             clip_zero=True).reshape(i, a)
        child_costs = tc + h
        # Bellman label of the popped node (astar.py:37-44); with double-Q,
        # selection by the current net, evaluation by the target net
        if sel_params is None:
            backed = jnp.min(child_costs, axis=1)
        else:
            h_sel = heuristic_values(env, model, sel_params, sel_stats,
                                     flat, clip_zero=True).reshape(i, a)
            pick = jnp.argmin(tc + h_sel, axis=1)
            backed = child_costs[rows, pick]
        label = backed * (1.0 - pop_solved.astype(jnp.float32))

        solved_ch = env.is_solved(flat).reshape(i, a)
        child_g = (pop_g + 1).astype(jnp.float32)
        child_f = (weights[:, None] * child_g[:, None]
                   + h * (1.0 - solved_ch.astype(jnp.float32)))
        # children of an empty-open (invalid) pop never enter the list; the
        # reference expands even goal pops (astar.py:266-291), so we do too
        child_f = jnp.where(valid[:, None], child_f, inf)

        # drop children already closed (remove_in_closed, astar.py:173-177)
        ch_fp0, ch_fp1 = fingerprint(flat, consts)
        ch_fp0 = ch_fp0.reshape(i, a)
        ch_fp1 = ch_fp1.reshape(i, a)
        dup = jnp.any((ch_fp0[:, :, None] == c_fp0[:, None, :])
                      & (ch_fp1[:, :, None] == c_fp1[:, None, :]), axis=2)
        child_f = jnp.where(dup, inf, child_f)

        base = 1 + step * a
        slots = base + jnp.arange(a)
        o_states = o_states.at[:, slots, :].set(children)
        o_g = o_g.at[:, slots].set(pop_g[:, None] + 1)
        o_f = o_f.at[:, slots].set(child_f)
        o_fp0 = o_fp0.at[:, slots].set(ch_fp0)
        o_fp1 = o_fp1.at[:, slots].set(ch_fp1)

        # every real pop is a labeled sample (updater.py:42-50 labels all
        # popped nodes, goal or not)
        out = (pop_s, label, valid)
        return (o_states, o_g, o_f, o_fp0, o_fp1, c_fp0, c_fp1,
                found_goal), out

    init = (open_states, open_g, open_f, open_fp0, open_fp1,
            closed_fp0, closed_fp1, jnp.zeros((i,), bool))
    carry, (t_states, t_ctg, t_valid) = jax.lax.scan(
        body, init, jnp.arange(num_steps))
    found_goal = carry[-1]
    return AStarExploreResult(t_states, t_ctg, t_valid, found_goal)
