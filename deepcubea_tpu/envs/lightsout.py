"""Lights Out as a batched XOR-mask kernel.

State: flat (dim^2,) binary uint8 array; goal = all zeros
(reference environments/lights_out.py:56-63). Action k toggles cell k and its
plus-shaped neighbors. The reference applies a (n_tiles, 5) index list as a
scatter (lights_out.py:33-43, 155-166); here each action is a precomputed
(dim^2,) binary mask and a move is `state XOR mask[action]` — one gather and
one vector XOR, branch-free. Every move is self-inverse
(lights_out.py:53-54).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Environment


def build_toggle_masks(dim: int) -> np.ndarray:
    """(dim^2, dim^2) uint8: rows are plus-shaped toggle masks.

    Matches the reference neighborhood (lights_out.py:33-43): the cell
    itself plus the four grid neighbors, clamped at edges (clamped
    neighbors collapse onto already-set cells, so edges toggle fewer).
    """
    n = dim * dim
    masks = np.zeros((n, n), dtype=np.uint8)
    for move in range(n):
        x, y = divmod(move, dim)
        cells = {move}
        if x < dim - 1:
            cells.add(move + dim)
        if x > 0:
            cells.add(move - dim)
        if y < dim - 1:
            cells.add(move + 1)
        if y > 0:
            cells.add(move - 1)
        masks[move, list(cells)] = 1
    return masks


class LightsOut(Environment):
    """dim x dim Lights Out (reference environments/lights_out.py)."""

    def __init__(self, dim: int):
        self.dim = dim
        self.state_width = dim * dim
        self.num_actions = dim * dim
        self.dtype = np.uint8
        self.one_hot_depth = 6  # reference quirk: depth 6 for binary input (lights_out.py:81)
        self.encoded_width = self.state_width
        self.name = f"lightsout{dim}"

        self._masks_np = build_toggle_masks(dim)
        self._masks = jnp.asarray(self._masks_np)
        self._reverse = np.arange(self.num_actions, dtype=np.int32)  # self-inverse

    def step(self, states: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        return states ^ self._masks[actions]

    def expand(self, states: jnp.ndarray):
        children = states[:, None, :] ^ self._masks[None, :, :]
        tc = jnp.ones((states.shape[0], self.num_actions), dtype=jnp.float32)
        return children, tc

    def is_solved(self, states: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(states == 0, axis=1)

    def goal_states(self, n: int) -> jnp.ndarray:
        return jnp.zeros((n, self.state_width), dtype=jnp.uint8)

    @property
    def reverse_action_map(self) -> np.ndarray:
        return self._reverse

    def encode(self, states: jnp.ndarray) -> jnp.ndarray:
        return states.astype(jnp.int32)

    @property
    def nnet_config(self) -> dict:
        # reference lights_out.py:80-83
        return dict(state_dim=self.state_width, one_hot_depth=6, h1_dim=5000,
                    resnet_dim=1000, num_resnet_blocks=4, out_dim=1,
                    batch_norm=True)

    def optimal_costs(self, states) -> np.ndarray:
        """Exact optimal press counts via the GF(2) oracle
        (lightsout_oracle.py). Host-side numpy — evaluation/diagnostic
        capability the reference never had (its lightsout7 baseline lists
        optimal as n/a); -1 marks unsolvable states (singular boards only).
        """
        if not hasattr(self, "_oracle"):
            from .lightsout_oracle import LightsOutOracle
            self._oracle = LightsOutOracle(self.dim)
        return self._oracle.optimal_costs(np.asarray(states))
