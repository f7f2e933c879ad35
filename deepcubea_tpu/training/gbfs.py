"""Batched greedy best-first search, fully device-resident.

Replaces the reference's per-instance Python GBFS objects
(search_methods/gbfs.py:10-124) with one jitted `lax.scan`: all instances
advance in lockstep, solved instances freeze via masks (SURVEY.md §7 "ragged
batches -> masking, not dynamic shapes").

Two uses, as in the reference:
  (a) the AVI labeler/explorer (updaters/updater.py:11-33): every visited
      state is labeled with its one-step Bellman backup
      y = min_a(tc + h_target(child)) * (1 - solved)   (utils/search_utils.py:16-32)
  (b) the training-time eval `gbfs_test` (gbfs.py:127-181): bucketed scramble
      depths, %solved / avg steps / ctg stats per bucket.

Cycle handling: the reference keeps a per-instance Python set of seen states
and takes a uniformly random child when the greedy child was already seen
(gbfs.py:114-118). Device equivalent: a per-instance ring buffer of the last
`SEEN_RING` state fingerprints; matches short cycles (the overwhelmingly
common case for greedy search) with O(1) memory.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.base import Environment, fingerprint, fingerprint_constants
from ..models.resnet import ResnetValueNet
from .heuristic import heuristic_values

SEEN_RING = 8


class GBFSResult(NamedTuple):
    states: jnp.ndarray        # final states (B, W)
    is_solved: jnp.ndarray     # (B,) bool
    num_steps: jnp.ndarray     # (B,) int32 steps taken while unsolved
    traj_states: jnp.ndarray   # (K, B, W) states visited (for labeling)
    traj_ctg: jnp.ndarray      # (K, B) Bellman-backup labels
    traj_valid: jnp.ndarray    # (K, B) bool: state was live when visited


def bellman_backup(env: Environment, model: ResnetValueNet, params,
                   batch_stats, states: jnp.ndarray,
                   clip_zero: bool = False, sel_params=None,
                   sel_stats=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-step Bellman backup over all children.

    Returns (ctg_backup (B,), child_costs (B, A), children (B, A, W)).
    Semantics of utils/search_utils.py:16-32: solved states back up to 0.

    With `sel_params` (double-Q labeling, --double_q): the argmin child is
    SELECTED by the current net and EVALUATED by the target net, decoupling
    selection noise from evaluation. The plain min over A children of a
    noisy value harvests ~E[min of A noise draws] below the mean every
    backup; for lightsout7 (A=49, sigma~0.5) that is ~-1.1 — enough to
    cancel the +1 edge cost and freeze value iteration at a false fixed
    point ~2 below the true cost (measured: docs/LIGHTSOUT_DEBUG.md).
    Double-Q (van Hasselt 2010; Double DQN 2015) removes the
    selection-evaluation correlation; labels stay anchored to solved
    states through the same Bellman chain.
    """
    b = states.shape[0]
    children, tc = env.expand(states)
    flat = children.reshape(b * env.num_actions, env.state_width)
    h = heuristic_values(env, model, params, batch_stats, flat,
                         clip_zero=clip_zero)
    child_costs = tc + h.reshape(b, env.num_actions)
    solved = env.is_solved(states)
    not_solved = 1.0 - solved.astype(jnp.float32)
    if sel_params is None:
        ctg = jnp.min(child_costs, axis=1) * not_solved
    else:
        h_sel = heuristic_values(env, model, sel_params, sel_stats, flat,
                                 clip_zero=clip_zero)
        pick = jnp.argmin(tc + h_sel.reshape(b, env.num_actions), axis=1)
        ctg = child_costs[jnp.arange(b), pick] * not_solved
    return ctg, child_costs, children


@partial(jax.jit, static_argnames=("env", "model", "num_steps",
                                   "record_trajs", "seen_ring"))
def gbfs_run(env: Environment, model: ResnetValueNet, params, batch_stats,
             states: jnp.ndarray, eps: jnp.ndarray, key: jax.Array,
             num_steps: int, record_trajs: bool = True,
             seen_ring: int = SEEN_RING, sel_params=None,
             sel_stats=None) -> GBFSResult:
    """Run `num_steps` of batched GBFS from `states` with per-instance
    epsilon-greedy exploration (updater.py:12: eps ~ U[0, eps_max)).

    `seen_ring` is the per-instance seen-set window (the reference keeps an
    unbounded set, gbfs.py:114-118; a ring of the last N fingerprints
    catches cycles up to period N -- see docs/RESULTS.md ring study)."""
    b, w = states.shape
    fp_consts = fingerprint_constants(w)

    def init_ring(s):
        f0, f1 = fingerprint(s, fp_consts)
        ring = jnp.zeros((b, seen_ring, 2), dtype=jnp.uint32)
        ring = ring.at[:, 0, 0].set(f0).at[:, 0, 1].set(f1)
        return ring

    def body(carry, k):
        s, solved, steps, ring, ring_pos = carry
        solved_now = env.is_solved(s)
        newly_solved = solved_now & ~solved

        ctg, child_costs, children = bellman_backup(
            env, model, params, batch_stats, s,
            sel_params=sel_params, sel_stats=sel_stats)

        greedy = jnp.argmin(child_costs, axis=1)
        k_eps, k_rand, k_seen = jax.random.split(k, 3)
        rand_act = jax.random.randint(k_rand, (b,), 0, env.num_actions)

        # seen check on the greedy child (gbfs.py:115-118)
        rows = jnp.arange(b)
        greedy_child = children[rows, greedy]
        g0, g1 = fingerprint(greedy_child, fp_consts)
        seen = jnp.any((ring[:, :, 0] == g0[:, None]) &
                       (ring[:, :, 1] == g1[:, None]), axis=1)
        eps_roll = jax.random.uniform(k_eps, (b,)) < eps
        act = jnp.where(eps_roll | seen, rand_act, greedy)
        nxt = children[rows, act]

        live = ~(solved | solved_now)
        s_out = jnp.where(live[:, None], nxt, s)
        steps_out = steps + live.astype(jnp.int32)

        # push the *new current* state fingerprint into the ring
        f0, f1 = fingerprint(s_out, fp_consts)
        ring = ring.at[rows, ring_pos, 0].set(f0)
        ring = ring.at[rows, ring_pos, 1].set(f1)
        ring_pos = (ring_pos + 1) % seen_ring

        solved_out = solved | solved_now
        # trajectory record: visited state s with label ctg (0 if solved);
        # valid while the instance had not already been solved before this
        # step (a solved instance contributes its terminal 0-label once,
        # gbfs.py:83)
        valid = ~solved | newly_solved
        out = (s, ctg, valid) if record_trajs else None
        return (s_out, solved_out, steps_out, ring, ring_pos), out

    keys = jax.random.split(key, num_steps)
    init = (states, jnp.zeros((b,), bool), jnp.zeros((b,), jnp.int32),
            init_ring(states), jnp.ones((b,), jnp.int32) % seen_ring)
    (s_fin, solved, steps, _, _), trajs = jax.lax.scan(body, init, keys)

    # count terminal solves reached exactly at the horizon
    solved = solved | env.is_solved(s_fin)

    if record_trajs:
        traj_states, traj_ctg, traj_valid = trajs
    else:
        traj_states = jnp.zeros((0, b, w), states.dtype)
        traj_ctg = jnp.zeros((0, b), jnp.float32)
        traj_valid = jnp.zeros((0, b), bool)
    return GBFSResult(s_fin, solved, steps, traj_states, traj_ctg, traj_valid)


def gbfs_test(env: Environment, model: ResnetValueNet, params, batch_stats,
              num_states: int, back_max: int, key: jax.Array,
              max_solve_steps: Optional[int] = None,
              num_buckets: int = 30, log=print) -> dict:
    """Training-time eval (reference gbfs.py:127-181): scramble-depth buckets
    over linspace(0, back_max, 30), greedy-solve, report per-bucket stats."""
    back_steps = np.unique(np.linspace(0, back_max, num_buckets, dtype=np.int64))
    reps = int(np.ceil(num_states / len(back_steps)))
    depths_np = np.tile(back_steps, reps)[:num_states].astype(np.int32)
    n = depths_np.shape[0]

    k_gen, k_run = jax.random.split(key)
    states, depths = env.generate_scrambles(k_gen, n, back_max,
                                            depths=jnp.asarray(depths_np))
    if max_solve_steps is None:
        max_solve_steps = max(int(depths_np.max()), 1)

    res = gbfs_run(env, model, params, batch_stats, states,
                   jnp.zeros((n,)), k_run, int(max_solve_steps),
                   record_trajs=False)
    ctg = heuristic_values(env, model, params, batch_stats, states)

    solved_np = np.asarray(res.is_solved)
    steps_np = np.asarray(res.num_steps)
    ctg_np = np.asarray(ctg)

    per_bucket = {}
    log(f"Solving {n} states with GBFS with {max_solve_steps} steps")
    for d in back_steps:
        m = depths_np == d
        if not m.any():
            continue
        per_solved = 100.0 * solved_np[m].mean()
        avg_steps = float(steps_np[m][solved_np[m]].mean()) if solved_np[m].any() else 0.0
        stats = dict(per_solved=per_solved, avg_solve_steps=avg_steps,
                     ctg_mean=float(ctg_np[m].mean()), ctg_std=float(ctg_np[m].std()),
                     ctg_min=float(ctg_np[m].min()), ctg_max=float(ctg_np[m].max()))
        per_bucket[int(d)] = stats
        log("Back Steps: %i, %%Solved: %.2f, avgSolveSteps: %.2f, "
            "CTG Mean(Std/Min/Max): %.2f(%.2f/%.2f/%.2f)" % (
                d, per_solved, avg_steps, stats["ctg_mean"], stats["ctg_std"],
                stats["ctg_min"], stats["ctg_max"]))
    return per_bucket
