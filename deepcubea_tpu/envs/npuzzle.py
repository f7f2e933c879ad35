"""n x n sliding-tile puzzle as a batched two-point scatter kernel.

State: flat (n^2,) uint8 tile array (0 = blank); goal = [1..n^2-1, 0]
(reference environments/n_puzzle.py:41). Moves U/D/R/L move the tile into the
blank; blocked moves are no-ops — the blank "swaps with itself"
(reference n_puzzle.py:211-212). The eligible-swap table `swap_zero_idxs`
(n^2, 4) is precomputed (reference n_puzzle.py:174-214); a batched move is
blank lookup + one gather + two scatters.

The reference threads the blank index through callers (n_puzzle.py:216-231);
here states are self-contained and the blank is recovered with one vectorized
argmax — keeping the functional API uniform across domains.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Environment

MOVES = ["U", "D", "L", "R"]  # reverse: D, U, R, L (reference n_puzzle.py:28-29)


def build_swap_table(n: int) -> np.ndarray:
    """(n^2, 4) int32: target cell the blank swaps with, per blank cell and
    move; ineligible moves map the blank to itself (no-op)."""
    tbl = np.zeros((n * n, 4), dtype=np.int32)
    for i in range(n):
        for j in range(n):
            z = i * n + j
            for a, move in enumerate(MOVES):
                if move == "U" and i < n - 1:
                    si, sj = i + 1, j
                elif move == "D" and i > 0:
                    si, sj = i - 1, j
                elif move == "L" and j < n - 1:
                    si, sj = i, j + 1
                elif move == "R" and j > 0:
                    si, sj = i, j - 1
                else:
                    si, sj = i, j
                tbl[z, a] = si * n + sj
    return tbl


class NPuzzle(Environment):
    """Sliding puzzle: dim 4 -> 15-puzzle, 5 -> 24, 6 -> 35, 7 -> 48."""

    def __init__(self, dim: int):
        self.dim = dim
        self.state_width = dim * dim
        self.num_actions = 4
        self.dtype = np.uint8
        self.one_hot_depth = dim * dim
        self.encoded_width = self.state_width
        self.name = f"puzzle{dim * dim - 1}"

        self._swap_np = build_swap_table(dim)
        self._swap = jnp.asarray(self._swap_np)
        self._goal_np = np.concatenate(
            [np.arange(1, dim * dim), [0]]).astype(np.uint8)
        self._reverse = np.array([1, 0, 3, 2], dtype=np.int32)

    def step(self, states: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        b = states.shape[0]
        rows = jnp.arange(b)
        z = jnp.argmax(states == 0, axis=1)                    # blank cell
        sw = self._swap[z, actions]                            # swap target
        moved = states[rows, sw]
        out = states.at[rows, z].set(moved)
        out = out.at[rows, sw].set(0)
        return out

    def is_solved(self, states: jnp.ndarray) -> jnp.ndarray:
        goal = jnp.asarray(self._goal_np)
        return jnp.all(states == goal[None, :], axis=1)

    def goal_states(self, n: int) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.asarray(self._goal_np), (n, self.state_width))

    @property
    def reverse_action_map(self) -> np.ndarray:
        return self._reverse

    def encode(self, states: jnp.ndarray) -> jnp.ndarray:
        # raw tile ids, one-hotted in the net (reference n_puzzle.py:84-89)
        return states.astype(jnp.int32)

    @property
    def nnet_config(self) -> dict:
        # reference n_puzzle.py:94-98
        return dict(state_dim=self.state_width, one_hot_depth=self.dim ** 2,
                    h1_dim=5000, resnet_dim=1000, num_resnet_blocks=4,
                    out_dim=1, batch_norm=True)
