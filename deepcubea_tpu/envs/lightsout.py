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
    """dim x dim Lights Out (reference environments/lights_out.py).

    `gf2_features=True` (env name `lightsout{dim}gf2`) widens the network
    input with the board's GF(2)-canonical press vector x = A^{-1} s
    (lightsout_oracle.py) — the domain's natural coordinates, in which
    presses commute to single-bit flips. Search state, moves, and goal
    test are unchanged; only `encode` differs, exactly like one-hot depth
    is an input-representation choice (reference lights_out.py:80-83).
    Motivation (docs/LIGHTSOUT_DEBUG.md round-5 section): in raw
    coordinates the optimal cost is a 49-bit parity family, which SGD on
    an MLP cannot rank beyond cost ~18 (measured, diag_lo7_dist.py), so
    the identical-recipe AVI run climbs ~0.017 pp/update — years of
    updates from the reference's endpoint. In canonical coordinates the
    same AVI recipe converges immediately; requires an invertible toggle
    matrix (true for the 7x7 board the reference trains)."""

    def __init__(self, dim: int, gf2_features: bool = False):
        self.dim = dim
        self.state_width = dim * dim
        self.num_actions = dim * dim
        self.dtype = np.uint8
        self.one_hot_depth = 6  # reference quirk: depth 6 for binary input (lights_out.py:81)
        self.encoded_width = self.state_width
        self.name = f"lightsout{dim}"
        self.gf2_features = gf2_features
        if gf2_features:
            from .lightsout_oracle import LightsOutOracle
            oracle = LightsOutOracle(dim)
            if len(oracle.kernel):
                raise ValueError(
                    f"lightsout{dim}: toggle matrix singular "
                    f"(nullity {len(oracle.kernel)}); gf2 features need "
                    f"the unique-solution case")
            self._oracle = oracle
            self._pinv = jnp.asarray(oracle.pinv.astype(np.int32))
            self.encoded_width = 2 * self.state_width
            self.name = f"lightsout{dim}gf2"

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
        x = states.astype(jnp.int32)
        if self.gf2_features:
            press = (x @ self._pinv.T) % 2  # GF(2) canonical coordinates
            x = jnp.concatenate([x, press], axis=1)
        return x

    @property
    def nnet_config(self) -> dict:
        # reference lights_out.py:80-83
        return dict(state_dim=self.encoded_width, one_hot_depth=6,
                    h1_dim=5000, resnet_dim=1000, num_resnet_blocks=4,
                    out_dim=1, batch_norm=True)

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
