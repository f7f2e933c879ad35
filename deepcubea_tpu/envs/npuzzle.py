"""n x n sliding-tile puzzle as a batched two-point scatter kernel.

State: flat (n^2,) uint8 tile array (0 = blank); goal = [1..n^2-1, 0]
(reference environments/n_puzzle.py:41). Moves U/D/R/L move the tile into the
blank; blocked moves are no-ops — the blank "swaps with itself"
(reference n_puzzle.py:211-212). The eligible-swap table `swap_zero_idxs`
(n^2, 4) is precomputed (reference n_puzzle.py:174-214).

The reference threads the blank index through callers (n_puzzle.py:216-231)
and moves with per-row scatters; here states are self-contained and a move is
pure mask arithmetic: the blank mask is `state == 0`, the swap-target mask
comes from one small (B, W*A) @ (W*A, W) matmul against the precomputed
one-hot swap table (MXU-friendly; per-row dynamic gather/scatter doesn't
vectorize on TPU lanes and is ~4x slower in a scramble scan).
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

        # (W, A, W) one-hot of the swap table, flattened for the step matmul:
        # row z*A+a is onehot(swap[z, a])
        w, a = self.state_width, self.num_actions
        sw1h = np.zeros((w, a, w), np.float32)
        sw1h[np.arange(w)[:, None], np.arange(a)[None, :], self._swap_np] = 1.0
        self._swap_onehot = jnp.asarray(sw1h.reshape(w * a, w), jnp.bfloat16)

    def _swap_masks(self, states: jnp.ndarray, sel: jnp.ndarray):
        """(blank mask (B, W) bool, swap-target mask (B, ..., W) bool) where
        `sel` is a (B, ..., A) action one-hot."""
        w, a = self.state_width, self.num_actions
        zmask = states == 0
        outer = zmask[:, None, :] if sel.ndim == 3 else zmask
        outer = (sel[..., None, :] * outer[..., :, None]).reshape(
            *sel.shape[:-1], w * a)
        swm = jnp.dot(outer.astype(jnp.bfloat16), self._swap_onehot) > 0.5
        return zmask, swm

    def step(self, states: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        sel = actions[:, None] == jnp.arange(self.num_actions)[None, :]
        zmask, swm = self._swap_masks(states, sel)
        moved = jnp.sum(states * swm.astype(states.dtype), axis=-1,
                        dtype=states.dtype)
        keep = ~(zmask | swm)
        # blocked moves have swm == zmask and moved == 0, so out == states
        return (states * keep.astype(states.dtype)
                + moved[:, None] * zmask.astype(states.dtype))

    def expand(self, states: jnp.ndarray):
        b = states.shape[0]
        sel = jnp.broadcast_to(jnp.eye(self.num_actions, dtype=bool),
                               (b, self.num_actions, self.num_actions))
        zmask, swm = self._swap_masks(states, sel)       # (B, A, W)
        moved = jnp.sum(states[:, None, :] * swm.astype(states.dtype), axis=-1,
                        dtype=states.dtype)
        keep = ~(zmask[:, None, :] | swm)
        children = (states[:, None, :] * keep.astype(states.dtype)
                    + moved[:, :, None] * zmask[:, None, :].astype(states.dtype))
        tc = jnp.ones((b, self.num_actions), dtype=jnp.float32)
        return children, tc

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
