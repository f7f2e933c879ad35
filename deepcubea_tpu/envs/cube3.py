"""Rubik's cube environment as a batched permutation-gather kernel.

State: flat (54,) uint8 sticker array, index = face*9 + row*3 + col with
faces ordered U=0, D=1, L=2, R=3, B=4, F=5 and goal colors = index // 9 —
the same encoding as the reference (environments/cube3.py:37, 77-85), so its
pickled test sets load directly. A quarter-turn is a fixed permutation of the
54 positions; the 12 moves live in one (12, 54) table and a move is a single
gather `next = state[perm[action]]` (the reference does the same idea as a
scatter of changed indices, cube3.py:163-171 and cpp/environments.cpp:222-234).

Move ordering matches the reference (cube3.py:28): for each face U,D,L,R,B,F
the -1 (counter) then +1 (clockwise-convention) turn; reverse of move 2k is
2k+1 and vice versa.

The table builder below is a clean-room construction from the face-adjacency
convention the reference encodes (cube3.py:173-256): a signed turn rotates the
face's own 3x3 sticker grid by 90 degrees and cycles the four adjacent-face
border strips. It generalizes over cube_len (the C++ side also ships a 4x4x4,
cpp/environments.h:125-145).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from .base import Environment

# Face indices. Colors in the goal state are face indices (sticker // n^2).
U, D, L, R, B, F = 0, 1, 2, 3, 4, 5
FACE_NAMES = ["U", "D", "L", "R", "B", "F"]

# For each face, the four adjacent faces in the cyclic order their border
# strips are cycled by a turn of that face.
_ADJ_FACES: Dict[int, List[int]] = {
    U: [L, F, R, B],
    D: [L, B, R, F],
    L: [U, B, D, F],
    R: [U, F, D, B],
    B: [U, R, D, L],
    F: [U, L, D, R],
}


def _strip(spec, n: int) -> List[Tuple[int, int]]:
    """Expand a (rows, cols) strip spec where one element is a scalar and the
    other an ordered index sequence into a list of n (row, col) cells."""
    rows, cols = spec
    rows = [rows] * n if isinstance(rows, int) else list(rows)
    cols = [cols] * n if isinstance(cols, int) else list(cols)
    return list(zip(rows, cols))


def _adj_strips(n: int, depth: int = 0) -> Dict[int, Dict[int, List[Tuple[int, int]]]]:
    """The strip of each neighbor face cycled by a turn of a given face at
    layer `depth` (0 = the outer border touching the face), in an
    orientation consistent with _ADJ_FACES cycling. Depth > 0 gives the
    inner-slice moves of big cubes (the C++ 4x4x4, environments.h:125-145)."""
    fwd = list(range(n))
    rev = list(range(n - 1, -1, -1))
    lo, hi = depth, n - 1 - depth
    return {
        U: {L: _strip((fwd, hi), n), F: _strip((fwd, hi), n),
            R: _strip((fwd, hi), n), B: _strip((fwd, hi), n)},
        D: {L: _strip((fwd, lo), n), B: _strip((fwd, lo), n),
            R: _strip((fwd, lo), n), F: _strip((fwd, lo), n)},
        L: {U: _strip((lo, fwd), n), B: _strip((hi, rev), n),
            D: _strip((lo, fwd), n), F: _strip((lo, fwd), n)},
        R: {U: _strip((hi, fwd), n), F: _strip((hi, fwd), n),
            D: _strip((hi, fwd), n), B: _strip((lo, rev), n)},
        B: {U: _strip((fwd, hi), n), R: _strip((hi, rev), n),
            D: _strip((rev, lo), n), L: _strip((lo, fwd), n)},
        F: {U: _strip((fwd, lo), n), L: _strip((hi, fwd), n),
            D: _strip((rev, hi), n), R: _strip((lo, rev), n)},
    }


def build_move_permutations(cube_len: int, num_layers: int = 1) -> np.ndarray:
    """(6 * 2 * num_layers, n^2 * 6) permutation table; next = state[perm[a]].

    Move ordering: for face f in U,D,L,R,B,F, sign s in (-1, +1), layer l in
    0..num_layers-1, index = (2f + (s==1)) * num_layers + l — num_layers=1
    reproduces the reference cube3 ordering (cube3.py:28). Layer 0 rotates
    the face's own sticker grid and cycles the outer strips; deeper layers
    cycle inner strips only (the 4x4x4's 24-move set).
    """
    n = cube_len
    n2 = n * n
    strips_by_depth = [_adj_strips(n, d) for d in range(num_layers)]

    def flat(face: int, r: int, c: int) -> int:
        return face * n2 + r * n + c

    perms = np.zeros((12 * num_layers, 6 * n2), dtype=np.int32)
    for face in range(6):
        for si, sign in enumerate((-1, 1)):
            for layer in range(num_layers):
                perm = np.arange(6 * n2, dtype=np.int32)
                if layer == 0:
                    # rotate the face's own sticker grid by 90 degrees
                    for i in range(n):
                        for j in range(n):
                            if sign == 1:
                                src = (n - 1 - j, i)
                            else:
                                src = (j, n - 1 - i)
                            perm[flat(face, i, j)] = flat(face, *src)
                # cycle the adjacent strips at this depth
                adj = _ADJ_FACES[face]
                strips = strips_by_depth[layer]
                for i, face_to in enumerate(adj):
                    face_from = adj[(i + sign) % 4]
                    cells_to = strips[face][face_to]
                    cells_from = strips[face][face_from]
                    for (rt, ct), (rf, cf) in zip(cells_to, cells_from):
                        perm[flat(face_to, rt, ct)] = flat(face_from, rf, cf)
                perms[(2 * face + si) * num_layers + layer] = perm
    return perms


class Cube3(Environment):
    """NxNxN Rubik's cube (reference environments/cube3.py for N=3; the
    reference's C++-only 4x4x4 with 24 layered moves, environments.h:125-145,
    is the num_layers=2 instantiation — see Cube4)."""

    name = "cube3"

    def __init__(self, cube_len: int = 3, num_layers: int = 1):
        self.cube_len = cube_len
        self.num_layers = num_layers
        n2 = cube_len * cube_len
        self.state_width = 6 * n2
        self.num_actions = 12 * num_layers
        self.dtype = np.uint8
        self.one_hot_depth = 6
        self.encoded_width = self.state_width

        self._perms_np = build_move_permutations(cube_len, num_layers)
        self._perms = jnp.asarray(self._perms_np)
        self._goal_np = np.arange(self.state_width, dtype=np.uint8)
        # reverse of (face, -1, layer) is (face, +1, layer): the sign bit is
        # bit log2(num_layers) of the move index (num_layers is 1 or 2)
        assert num_layers in (1, 2)
        self._reverse = np.arange(self.num_actions, dtype=np.int32) ^ num_layers

    # dynamics ---------------------------------------------------------- #

    def step(self, states: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        # All-action children via a STATIC gather (constant indices compile
        # to pure data movement), then a one-hot select over the small action
        # axis. A per-state dynamic gather (take_along_axis) is ~25x slower
        # on TPU in a scramble scan: dynamic lane gathers don't vectorize.
        # PRECONDITION: actions in [0, num_actions) — an out-of-range id
        # matches no one-hot row and yields an all-zero state (host paths
        # that carry -1 padding must mask or assert first).
        children = states[:, self._perms]  # (B, A, W)
        sel = actions[:, None] == jnp.arange(self.num_actions)[None, :]
        return jnp.sum(children * sel[:, :, None].astype(states.dtype),
                       axis=1).astype(states.dtype)

    def expand(self, states: jnp.ndarray):
        # one 3-D gather: (B, W) indexed by (A, W) -> (B, A, W)
        children = states[:, self._perms]
        tc = jnp.ones((states.shape[0], self.num_actions), dtype=jnp.float32)
        return children, tc

    def is_solved(self, states: jnp.ndarray) -> jnp.ndarray:
        goal = jnp.asarray(self._goal_np)
        return jnp.all(states == goal[None, :], axis=1)

    def goal_states(self, n: int) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.asarray(self._goal_np), (n, self.state_width))

    @property
    def reverse_action_map(self) -> np.ndarray:
        return self._reverse

    # network ----------------------------------------------------------- #

    def encode(self, states: jnp.ndarray) -> jnp.ndarray:
        # sticker id -> color id (reference cube3.py:77-85)
        return (states // (self.cube_len * self.cube_len)).astype(jnp.int32)

    @property
    def nnet_config(self) -> dict:
        # reference cube3.py:90-94
        return dict(state_dim=self.state_width, one_hot_depth=6, h1_dim=5000,
                    resnet_dim=1000, num_resnet_blocks=4, out_dim=1,
                    batch_norm=True)


class Cube4(Cube3):
    """4x4x4 cube, 24 layered quarter-turns (reference cpp/environments.h:
    125-145, cpp:263-370 — C++-only there: no Python counterpart, no trained
    net). Solved = every face uniform in color (cpp:356-366): on an even
    cube the centers are interchangeable, so sticker-level identity is too
    strict. Unlike the reference, this instantiation is fully trainable and
    searchable (value net config provided)."""

    name = "cube4"

    def __init__(self):
        super().__init__(cube_len=4, num_layers=2)

    def is_solved(self, states: jnp.ndarray) -> jnp.ndarray:
        n2 = self.cube_len * self.cube_len
        colors = (states // n2).reshape(states.shape[0], 6, n2)
        return jnp.all(colors == colors[:, :, :1], axis=(1, 2))
