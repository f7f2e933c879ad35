"""Sokoban (10x10, 4 boxes) as branch-free masked-update kernels.

State: packed flat uint8 vector of width 2 + 3*dim^2 (=302):
  [0:2]                agent (row, col)
  [2 : 2+n2]           box occupancy plane
  [2+n2 : 2+2*n2]      wall plane
  [2+2*n2 : 2+3*n2]    goal-box plane
The reference keeps these as four separate struct fields
(environments/sokoban.py:15-43); packing them into one vector makes sokoban
states first-class citizens of the domain-agnostic batched search/AVI kernels
(hashing, dedup, frontier storage all operate on (B, W) arrays).

Dynamics replace the reference's four-case fancy-index push logic
(sokoban.py:77-127) with `where`-selects: agent->wall, agent->box->blocked,
agent->box->empty (push), agent->empty. Actions 0..3 = up/down/left/right
row/col deltas, clamped at borders (sokoban.py:210-229).

Training states use hindsight goal relabeling (sokoban.py:163-180): seed from
a fixed board set, random-walk (1,100) steps, walk again `step_range` steps,
and adopt the final box configuration as the goal. Goals are per-state and
ride inside the packed vector.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Environment

# row/col deltas for actions 0..3 (reference sokoban.py:210-229)
_DELTAS = np.array([[-1, 0], [1, 0], [0, -1], [0, 1]], dtype=np.int32)


class Sokoban(Environment):
    name = "sokoban"

    def __init__(self, dim: int = 10, num_boxes: int = 4,
                 boards: Optional[dict] = None):
        self.dim = dim
        self.num_boxes = num_boxes
        n2 = dim * dim
        self.n2 = n2
        self.state_width = 2 + 3 * n2
        self.num_actions = 4
        self.dtype = np.uint8
        self.one_hot_depth = 0  # dense plane input (reference sokoban.py:143-146)
        self.encoded_width = 4 * n2
        # seed boards for hindsight generation: dict with uint8 arrays
        # agent (N,2), boxes (N,n2), walls (N,n2), goals (N,n2)
        self._boards = None
        if boards is not None:
            self.set_boards(boards)
        self._reverse = np.array([1, 0, 3, 2], dtype=np.int32)

    # ------------------------------------------------------------------ #

    def set_boards(self, boards: dict) -> None:
        # device-resident so board gathers trace under jit
        self._boards = {k: jnp.asarray(v, jnp.uint8) for k, v in boards.items()}

    def pack(self, agent, boxes, walls, goals) -> jnp.ndarray:
        return jnp.concatenate(
            [jnp.asarray(agent, jnp.uint8).reshape(-1, 2),
             jnp.asarray(boxes, jnp.uint8).reshape(-1, self.n2),
             jnp.asarray(walls, jnp.uint8).reshape(-1, self.n2),
             jnp.asarray(goals, jnp.uint8).reshape(-1, self.n2)], axis=1)

    def unpack(self, states: jnp.ndarray):
        n2 = self.n2
        agent = states[:, 0:2]
        boxes = states[:, 2:2 + n2]
        walls = states[:, 2 + n2:2 + 2 * n2]
        goals = states[:, 2 + 2 * n2:]
        return agent, boxes, walls, goals

    # dynamics ---------------------------------------------------------- #

    def _next_idx(self, pos: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        nxt = pos.astype(jnp.int32) + jnp.asarray(_DELTAS)[actions]
        return jnp.clip(nxt, 0, self.dim - 1)

    def step(self, states: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
        b = states.shape[0]
        rows = jnp.arange(b)
        agent, boxes, walls, goals = self.unpack(states)
        agent = agent.astype(jnp.int32)

        a_nxt = self._next_idx(agent, actions)
        a_flat = a_nxt[:, 0] * self.dim + a_nxt[:, 1]
        hit_wall = walls[rows, a_flat] > 0
        hit_box = boxes[rows, a_flat] > 0

        b_nxt = self._next_idx(a_nxt, actions)
        b_flat = b_nxt[:, 0] * self.dim + b_nxt[:, 1]
        box_blocked = (walls[rows, b_flat] > 0) | (boxes[rows, b_flat] > 0)

        push = hit_box & ~box_blocked
        agent_moves = (~hit_wall & ~hit_box) | push

        agent_out = jnp.where(agent_moves[:, None], a_nxt, agent).astype(jnp.uint8)
        boxes_out = boxes.at[rows, a_flat].set(
            jnp.where(push, 0, boxes[rows, a_flat]))
        boxes_out = boxes_out.at[rows, b_flat].set(
            jnp.where(push, 1, boxes_out[rows, b_flat]))

        return jnp.concatenate(
            [agent_out, boxes_out, walls, goals], axis=1).astype(jnp.uint8)

    def is_solved(self, states: jnp.ndarray) -> jnp.ndarray:
        _, boxes, _, goals = self.unpack(states)
        return jnp.all(boxes == goals, axis=1)

    def goal_states(self, n: int) -> jnp.ndarray:
        raise NotImplementedError(
            "sokoban has per-instance hindsight goals (reference sokoban.py:48-50)")

    @property
    def reverse_action_map(self) -> np.ndarray:
        # inverse exists for agent moves but not pushes; like the reference
        # (sokoban.py:52-54) prev_step is unsupported.
        raise NotImplementedError("sokoban moves are not invertible")

    def prev_step(self, states, actions):
        raise NotImplementedError("sokoban moves are not invertible")

    # network ----------------------------------------------------------- #

    def encode(self, states: jnp.ndarray) -> jnp.ndarray:
        agent, boxes, walls, goals = self.unpack(states)
        agent_flat = agent[:, 0].astype(jnp.int32) * self.dim + agent[:, 1]
        agent_plane = jax.nn.one_hot(agent_flat, self.n2, dtype=jnp.float32)
        # plane order matches reference state_to_nnet_input (sokoban.py:129-141)
        return jnp.concatenate(
            [agent_plane, walls.astype(jnp.float32), boxes.astype(jnp.float32),
             goals.astype(jnp.float32)], axis=1)

    @property
    def nnet_config(self) -> dict:
        # reference sokoban.py:143-146
        return dict(state_dim=self.encoded_width, one_hot_depth=0, h1_dim=5000,
                    resnet_dim=1000, num_resnet_blocks=4, out_dim=1,
                    batch_norm=True)

    def make_scramble_pool(self, back_max: int, num_chains: int):
        """Domain-specific mixing-chain pool (SokobanScramblePool below);
        picked up by AVITrainer in place of the generic goal-walk pool."""
        return SokobanScramblePool(self, back_max, num_chains)

    # hindsight state generation ---------------------------------------- #

    def _random_walk(self, key: jax.Array, states: jnp.ndarray,
                     step_range: Tuple[int, int],
                     depths: jnp.ndarray | None = None,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Walk each state an independent uniform number of steps in
        [lo, hi]; jitted scan over hi steps with per-state live masks."""
        lo, hi = int(step_range[0]), int(step_range[1])
        n = states.shape[0]
        k_depth, k_act = jax.random.split(key)
        if depths is None:
            depths = jax.random.randint(k_depth, (n,), lo, hi + 1)
        actions = jax.random.randint(k_act, (hi, n), 0, self.num_actions)

        def body(carry, inp):
            s, t = carry
            acts = inp
            nxt = self.step(s, acts)
            live = (t < depths)[:, None]
            return (jnp.where(live, nxt, s), t + 1), None

        (out, _), _ = jax.lax.scan(body, (states, 0), actions)
        return out, depths

    def generate_scrambles(self, key: jax.Array, n: int, back_max: int,
                           depths: jnp.ndarray | None = None,
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Hindsight training states (reference sokoban.py:163-180):
        seed -> walk (1,100) -> walk (0,back_max) -> relabel goals."""
        if self._boards is None:
            raise RuntimeError("sokoban needs seed boards; call set_boards()")
        k_seed, k_w1, k_w2 = jax.random.split(key, 3)
        num_boards = self._boards["agent"].shape[0]
        idxs = jax.random.randint(k_seed, (n,), 0, num_boards)
        seeds = self.pack(self._boards["agent"][idxs],
                          self._boards["boxes"][idxs],
                          self._boards["walls"][idxs],
                          self._boards["goals"][idxs])
        starts, _ = self._random_walk(k_w1, seeds, (1, 100))
        finals, depths = self._random_walk(k_w2, starts, (0, back_max),
                                           depths=depths)
        _, final_boxes, _, _ = self.unpack(finals)
        agent, boxes, walls, _ = self.unpack(starts)
        states = jnp.concatenate([agent, boxes, walls, final_boxes], axis=1)
        return states.astype(jnp.uint8), depths


class SokobanPoolState(NamedTuple):
    start: jnp.ndarray  # (C, W) packed state at stage-A end (the sample root)
    cur: jnp.ndarray    # (C, W) packed current walk state
    phase: jnp.ndarray  # (C,) int32: >=0 stage-B depth, <0 stage-A steps left


class SokobanScramblePool:
    """Two-stage mixing-chain pool for sokoban's hindsight generator.

    The reference distribution (sokoban.py:163-180, mirrored by
    `Sokoban.generate_scrambles`) is: seed board -> pre-walk U(1,100) steps
    (stage A, yielding the sample's start position) -> hindsight walk
    d ~ U(0, back_max) steps (stage B), with the final box layout becoming
    the goals. A fresh sample therefore costs O(100 + back_max) env steps —
    ~1100 per root at the training config (train.sh:79), which dominated
    the training iteration.

    As with `training.scramble_pool.ScramblePool`, one stage-B trajectory
    passes through EVERY depth 0..back_max: a chain at stage-B phase t
    emits the valid depth-t sample (start's agent/boxes/walls + cur's
    boxes as goals). Chains advance one step per iteration; a chain past
    back_max resets to a fresh seed board with a new U(1,100) stage-A
    countdown (during which it is simply not sampled — ~5% of chains at
    steady state). Warm start tiles stage-B phases exactly uniformly.
    """

    def __init__(self, env: "Sokoban", back_max: int, num_chains: int):
        if env._boards is None:
            raise RuntimeError("sokoban pool needs seed boards; "
                               "call set_boards() first")
        self.env = env
        self.back_max = back_max
        self.num_chains = num_chains

    def _packed_boards(self):
        b = self.env._boards
        return self.env.pack(b["agent"], b["boxes"], b["walls"], b["goals"])

    def init(self, key: jax.Array) -> SokobanPoolState:
        env, c = self.env, self.num_chains
        k_seed, k_w1, k_w2 = jax.random.split(key, 3)
        boards = self._packed_boards()
        idxs = jax.random.randint(k_seed, (c,), 0, boards.shape[0])
        seeds = boards[idxs]
        starts, _ = env._random_walk(k_w1, seeds, (1, 100))
        depths = jnp.arange(c, dtype=jnp.int32) % (self.back_max + 1)
        curs, _ = env._random_walk(k_w2, starts, (0, self.back_max),
                                   depths=depths)
        return SokobanPoolState(starts, curs, depths)

    def advance(self, pool: SokobanPoolState, key: jax.Array) -> SokobanPoolState:
        env, c = self.env, self.num_chains
        k_act, k_seed, k_pa = jax.random.split(key, 3)
        acts = jax.random.randint(k_act, (c,), 0, env.num_actions)
        nxt = env.step(pool.cur, acts)
        phase = pool.phase + 1
        # a chain whose stage-A countdown just expired records its start
        entering_b = phase == 0
        start = jnp.where(entering_b[:, None], nxt, pool.start)
        # chains past back_max reset to a fresh seed + new countdown
        over = phase > self.back_max
        boards = self._packed_boards()
        seed_idx = jax.random.randint(k_seed, (c,), 0, boards.shape[0])
        pa = jax.random.randint(k_pa, (c,), 1, 101)
        cur = jnp.where(over[:, None], boards[seed_idx], nxt)
        phase = jnp.where(over, -pa, phase)
        return SokobanPoolState(start, cur, phase)

    def sample(self, pool: SokobanPoolState, key: jax.Array, n: int):
        env, c = self.env, self.num_chains
        valid = pool.phase >= 0
        pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
        vlist = jnp.zeros((c,), jnp.int32).at[
            jnp.where(valid, pos, c)].set(jnp.arange(c, dtype=jnp.int32),
                                          mode="drop")
        nv = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
        idx = vlist[jax.random.randint(key, (n,), 0, nv)]
        agent, boxes, walls, _ = env.unpack(pool.start[idx])
        _, cur_boxes, _, _ = env.unpack(pool.cur[idx])
        states = jnp.concatenate([agent, boxes, walls, cur_boxes],
                                 axis=1).astype(jnp.uint8)
        return states, pool.phase[idx]

    def advance_and_sample(self, pool: SokobanPoolState, key: jax.Array,
                           n: int):
        k_adv, k_smp = jax.random.split(key)
        pool = self.advance(pool, k_adv)
        states, depths = self.sample(pool, k_smp, n)
        return pool, states, depths


def load_boards_from_grid(grid: np.ndarray) -> dict:
    """Convert the reference's seed-board encoding (N, dim, dim) with
    1=agent, 2=box, 3=goal, 4=wall (reference sokoban.py:64-68) into the
    packed plane dict used by Sokoban."""
    n, dim, _ = grid.shape
    agent_pos = np.argwhere(grid == 1)
    agent = np.zeros((n, 2), dtype=np.uint8)
    agent[agent_pos[:, 0]] = agent_pos[:, 1:].astype(np.uint8)
    return dict(
        agent=agent,
        boxes=(grid == 2).reshape(n, -1).astype(np.uint8),
        goals=(grid == 3).reshape(n, -1).astype(np.uint8),
        walls=(grid == 4).reshape(n, -1).astype(np.uint8),
    )
