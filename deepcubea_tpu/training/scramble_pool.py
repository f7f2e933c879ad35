"""Persistent mixing-chain scramble pool for deep-scramble training.

The stock `Environment.generate_scrambles` walks every training state from
the goal with a `back_max`-step `lax.scan` each iteration. At the
reference's n-puzzle/sokoban configs (back_max 500-1000, train.sh:21-57,79)
that scan dominates the iteration budget (~57 ms of a ~73 ms cube-sized
iteration at back_max 500, measured in round 1) — the per-sample cost of a
fresh uniform-depth walk is inherently O(back_max/2) env steps.

This pool amortizes that to O(1) steps per sample by exploiting that a
single goal->deep walk passes through EVERY depth 0..back_max along the
way. It keeps C persistent chains whose phases tile {0..back_max}
uniformly:

  - chain i holds (state_i, depth_i); the multiset {depth_i} is exactly
    ceil(C/(back_max+1)) copies of {0..back_max} at ALL times,
  - each training iteration advances every chain ONE random step (a chain
    at depth back_max resets to the goal at depth 0 instead),
  - the training batch is n rows gathered at uniformly random chain
    indices.

Sampled states are distributed exactly as the reference generator's
(environment_abstract.py:88-125): depth ~ U{0..back_max} (the phase tiling
is exact), and a state at depth d is a uniformly-random d-step walk from
the goal (the action set of every fixed-action domain is closed under
inversion, so forward walks from the goal sample the reverse-scramble
distribution). Consecutive batches are mildly correlated (a resampled
chain has moved one step); the reference reuses each 50M-state set for a
full epoch (avi.py:227), so effective freshness is strictly higher here.

Not used for sokoban, whose hindsight generator defines its own
distribution (envs/sokoban.py:173).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PoolState(NamedTuple):
    states: jnp.ndarray  # (C, W) env dtype
    depths: jnp.ndarray  # (C,) int32 current walk depth of each chain


class ScramblePool:
    """Static configuration (env, back_max, num_chains); all methods are
    pure and jit-closed so they can live inside the fused AVI chunk."""

    def __init__(self, env, back_max: int, num_chains: int):
        self.env = env
        self.back_max = back_max
        self.num_chains = num_chains

    @staticmethod
    def auto_chains(batch_size: int, back_max: int, factor: int = 4) -> int:
        """Smallest multiple of (back_max+1) with >= factor*batch_size
        chains — a multiple keeps the depth tiling exactly uniform."""
        period = back_max + 1
        return max(1, math.ceil(factor * batch_size / period)) * period

    def init(self, key: jax.Array) -> PoolState:
        """Warm-start: one full back_max-scan (the one-time cost), leaving
        chain i at phase i mod (back_max+1)."""
        c = self.num_chains
        depths = jnp.arange(c, dtype=jnp.int32) % (self.back_max + 1)
        states, _ = self.env.generate_scrambles(key, c, self.back_max,
                                                depths=depths)
        return PoolState(states, depths)

    def advance(self, pool: PoolState, key: jax.Array) -> PoolState:
        """One mixing step for every chain; depth-back_max chains reset to
        the goal (depth 0) so phases keep tiling {0..back_max}."""
        c = self.num_chains
        acts = jax.random.randint(key, (c,), 0, self.env.num_actions)
        nxt = self.env.step(pool.states, acts)
        live = (pool.depths < self.back_max)[:, None]
        goal = self.env.goal_states(c)
        states = jnp.where(live, nxt, goal)
        depths = jnp.where(pool.depths < self.back_max, pool.depths + 1, 0)
        return PoolState(states, depths)

    def sample(self, pool: PoolState, key: jax.Array, n: int,
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Gather n uniformly random chains -> (states (n, W), depths (n,))."""
        idx = jax.random.randint(key, (n,), 0, self.num_chains)
        return pool.states[idx], pool.depths[idx]

    def advance_and_sample(self, pool: PoolState, key: jax.Array, n: int,
                           ) -> Tuple[PoolState, jnp.ndarray, jnp.ndarray]:
        k_adv, k_smp = jax.random.split(key)
        pool = self.advance(pool, k_adv)
        states, depths = self.sample(pool, k_smp, n)
        return pool, states, depths
