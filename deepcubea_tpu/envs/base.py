"""Environment contract for TPU-native puzzle dynamics.

The reference defines a per-object `Environment` ABC operating on lists of
Python `State` objects (reference environments/environment_abstract.py:8-163)
plus a second, duplicated C++ implementation (reference cpp/environments.h:5-17).
Here there is ONE implementation per domain: pure functions over batched
`jnp` arrays, closed under `jax.jit`/`jax.vmap`, with static shapes.

State representation: every domain encodes a state as a fixed-width vector of
small unsigned integers, so a batch is a single `(B, state_width)` uint8 (or
int16) array. That uniformity is what lets scramble generation, Bellman
backups, GBFS and A* all be domain-agnostic device programs.

Environments are *static* configuration objects (hashable, no traced data);
jitted code closes over them. All tables are built once with numpy at
construction and captured as compile-time constants.
"""

from __future__ import annotations

import abc
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Environment(abc.ABC):
    """A goal-reaching puzzle domain with a fixed discrete action set.

    Replaces the reference `Environment` ABC
    (environments/environment_abstract.py:18-163). Methods take/return
    batched jnp arrays and must be traceable under jit with static shapes.
    """

    #: number of discrete actions (reference `get_num_moves`)
    num_actions: int
    #: width of the flat state vector
    state_width: int
    #: dtype of the state vector (uint8 for every shipped domain except
    #: puzzle dims > 4 which need int16 tile values > 255? no — max tile is
    #: n^2-1 <= 48 so uint8 always suffices; reference used platform int for
    #: dim > 4 only out of caution, n_puzzle.py:35-38)
    dtype: np.dtype = np.uint8
    #: size of the encoded network input (per-state feature count)
    encoded_width: int
    #: one-hot vocabulary size for the network input; 0 = already-dense input
    one_hot_depth: int

    # ------------------------------------------------------------------ #
    # Core dynamics
    # ------------------------------------------------------------------ #

    @abc.abstractmethod
    def step(self, states: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        """Apply per-state actions. (B, W), (B,) int32 -> (B, W).

        Replaces reference `next_state` (environment_abstract.py:24-31) but
        batched over *per-state* actions rather than one shared action.
        Transition cost is uniformly 1 in all shipped domains, so costs are
        not returned; `transition_costs` exists for API parity.
        """

    def transition_costs(self, states: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        """(B,) float32 transition costs; all shipped domains are unit-cost."""
        del actions
        return jnp.ones((states.shape[0],), dtype=jnp.float32)

    @abc.abstractmethod
    def is_solved(self, states: jnp.ndarray) -> jnp.ndarray:
        """(B, W) -> (B,) bool. Reference environment_abstract.py:53-60."""

    @abc.abstractmethod
    def goal_states(self, n: int) -> jnp.ndarray:
        """(n, W) batch of goal states. Reference `generate_goal_states`."""

    def expand(self, states: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """All children of every state: (B, W) -> ((B, A, W), (B, A) costs).

        Replaces reference `expand` (environment_abstract.py:127-163). The
        default applies every action via one vmapped `step`; domains with a
        cheaper closed form (cube3's single 3-D gather) override it.
        """
        num_a = self.num_actions

        def one_action(a):
            acts = jnp.full((states.shape[0],), a, dtype=jnp.int32)
            return self.step(states, acts)

        children = jax.vmap(one_action)(jnp.arange(num_a, dtype=jnp.int32))
        children = jnp.swapaxes(children, 0, 1)  # (B, A, W)
        tc = jnp.ones((states.shape[0], num_a), dtype=jnp.float32)
        return children, tc

    # ------------------------------------------------------------------ #
    # Action structure
    # ------------------------------------------------------------------ #

    @property
    @abc.abstractmethod
    def reverse_action_map(self) -> np.ndarray:
        """(A,) int32: index of each action's inverse.

        Reference keeps parallel `moves`/`moves_rev` string lists
        (cube3.py:28-29, n_puzzle.py:28-29); here it is an index table.
        Domains where actions are self-inverse map to themselves.
        """

    def prev_step(self, states: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        """Apply the inverse of each action (reference `prev_state`)."""
        rev = jnp.asarray(self.reverse_action_map, dtype=jnp.int32)
        return self.step(states, rev[actions])

    # ------------------------------------------------------------------ #
    # Network interface
    # ------------------------------------------------------------------ #

    @abc.abstractmethod
    def encode(self, states: jnp.ndarray) -> jnp.ndarray:
        """(B, W) state vectors -> (B, encoded_width) network inputs.

        Integer token outputs (to be one-hotted inside the net) for domains
        with one_hot_depth > 0, float planes otherwise (sokoban). Replaces
        reference `state_to_nnet_input`.
        """

    @property
    @abc.abstractmethod
    def nnet_config(self) -> dict:
        """Kwargs for models.resnet.ResnetValueNet matching the reference
        architecture for this domain (e.g. cube3.py:90-94)."""

    # ------------------------------------------------------------------ #
    # Scramble generation (training data)
    # ------------------------------------------------------------------ #

    def generate_scrambles(self, key: jax.Array, n: int, back_max: int,
                           depths: jnp.ndarray | None = None,
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """n scrambled states with per-state depth ~ U{0..back_max}.

        Replaces the reference's host-side subset-loop scramble generator
        (environment_abstract.py:88-125) with a single `lax.scan` of masked
        random moves backward from the goal — fully on device, deterministic
        under `key`, millions of states/s/chip. The action set of every
        fixed-action domain is closed under inversion, so walking with
        uniformly random (forward) moves from the goal samples the same
        distribution as the reference's reverse walk.

        Pass `depths` (n,) to pin per-state scramble depths (used by the
        bucketed GBFS eval, reference gbfs.py:130-141).

        Returns (states (n, W), depths (n,) int32).
        """
        k_depth, k_act = jax.random.split(key)
        if depths is None:
            depths = jax.random.randint(k_depth, (n,), 0, back_max + 1)
        actions = jax.random.randint(k_act, (back_max, n), 0, self.num_actions)
        states0 = self.goal_states(n)

        def body(carry, acts):
            s, t = carry
            nxt = self.step(s, acts)
            live = (t < depths)[:, None]
            return (jnp.where(live, nxt, s), t + 1), None

        (states, _), _ = jax.lax.scan(body, (states0, 0), actions)
        return states, depths

    # ------------------------------------------------------------------ #
    # Identity / registry
    # ------------------------------------------------------------------ #

    name: str = "env"

    def __hash__(self):  # envs are static; identity hash keeps jit caches keyed
        return id(self)

    def __eq__(self, other):
        return self is other


def fingerprint_constants(state_width: int, seed: int = 0xD5A7) -> np.ndarray:
    """Per-position odd multipliers for 2x32-bit universal state hashing.

    Used by the search layer's closed-set hash table: fp_k(s) =
    sum_i s[i] * C_k[i] (mod 2^32) for k in {0, 1}. Two independent 32-bit
    hashes give ~2^-64 pairwise collision odds, standing in for the
    byte-exact dedup of the reference (astar.py:55, cpp:104-111) without
    64-bit integers (TPUs run x32).
    """
    rng = np.random.RandomState(seed)
    consts = rng.randint(1, 2**31, size=(2, state_width), dtype=np.int64) * 2 + 1
    return consts.astype(np.uint32)


def fingerprint(states: jnp.ndarray, consts: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, W) uint8/int16 states -> two (B,) uint32 fingerprints."""
    s = states.astype(jnp.uint32)
    c = jnp.asarray(consts)  # (2, W) uint32
    h0 = jnp.sum(s * c[0][None, :], axis=1, dtype=jnp.uint32)
    h1 = jnp.sum(s * c[1][None, :], axis=1, dtype=jnp.uint32)
    # final avalanche mix (xorshift-multiply) to decorrelate low bits
    def mix(h):
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x7FEB352D)
        h = h ^ (h >> 15)
        h = h * jnp.uint32(0x846CA68B)
        h = h ^ (h >> 16)
        return h

    return mix(h0), mix(h1)
