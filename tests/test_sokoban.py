"""Sokoban kernel: crafted-board push-logic cases + parity with the
reference's vectorized dynamics (environments/sokoban.py:77-127)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcubea_tpu.envs import Sokoban
from deepcubea_tpu.envs.sokoban import load_boards_from_grid

DIM = 10


def make_state(env, agent, boxes=(), walls=(), goals=()):
    def plane(cells):
        p = np.zeros((DIM * DIM,), dtype=np.uint8)
        for (r, c) in cells:
            p[r * DIM + c] = 1
        return p

    return env.pack(np.array([agent], dtype=np.uint8),
                    plane(boxes)[None], plane(walls)[None], plane(goals)[None])


@pytest.fixture(scope="module")
def env():
    return Sokoban(DIM, 4)


# actions: 0=up(-row) 1=down(+row) 2=left(-col) 3=right(+col)

def test_agent_moves_to_empty(env):
    s = make_state(env, (5, 5))
    nxt = env.step(s, jnp.array([3], jnp.int32))
    agent, _, _, _ = env.unpack(nxt)
    np.testing.assert_array_equal(np.asarray(agent[0]), [5, 6])


def test_agent_blocked_by_wall(env):
    s = make_state(env, (5, 5), walls=[(5, 6)])
    nxt = env.step(s, jnp.array([3], jnp.int32))
    agent, _, _, _ = env.unpack(nxt)
    np.testing.assert_array_equal(np.asarray(agent[0]), [5, 5])


def test_agent_pushes_box(env):
    s = make_state(env, (5, 5), boxes=[(5, 6)])
    nxt = env.step(s, jnp.array([3], jnp.int32))
    agent, boxes, _, _ = env.unpack(nxt)
    np.testing.assert_array_equal(np.asarray(agent[0]), [5, 6])
    b = np.asarray(boxes[0]).reshape(DIM, DIM)
    assert b[5, 7] == 1 and b[5, 6] == 0 and b.sum() == 1


def test_push_blocked_by_wall(env):
    s = make_state(env, (5, 5), boxes=[(5, 6)], walls=[(5, 7)])
    nxt = env.step(s, jnp.array([3], jnp.int32))
    agent, boxes, _, _ = env.unpack(nxt)
    np.testing.assert_array_equal(np.asarray(agent[0]), [5, 5])
    assert np.asarray(boxes[0]).reshape(DIM, DIM)[5, 6] == 1


def test_push_blocked_by_box(env):
    s = make_state(env, (5, 5), boxes=[(5, 6), (5, 7)])
    nxt = env.step(s, jnp.array([3], jnp.int32))
    agent, boxes, _, _ = env.unpack(nxt)
    np.testing.assert_array_equal(np.asarray(agent[0]), [5, 5])
    b = np.asarray(boxes[0]).reshape(DIM, DIM)
    assert b[5, 6] == 1 and b[5, 7] == 1


def test_border_clamp(env):
    s = make_state(env, (0, 0))
    nxt = env.step(s, jnp.array([0], jnp.int32))  # up at top edge
    agent, _, _, _ = env.unpack(nxt)
    np.testing.assert_array_equal(np.asarray(agent[0]), [0, 0])


def test_box_push_at_border_blocked(env):
    # box at edge: pushing it off-board is blocked (clamped target == box cell)
    s = make_state(env, (0, 1), boxes=[(0, 0)])
    nxt = env.step(s, jnp.array([2], jnp.int32))  # left
    agent, boxes, _, _ = env.unpack(nxt)
    np.testing.assert_array_equal(np.asarray(agent[0]), [0, 1])
    assert np.asarray(boxes[0]).reshape(DIM, DIM)[0, 0] == 1


def test_is_solved(env):
    s = make_state(env, (5, 5), boxes=[(2, 2)], goals=[(2, 2)])
    assert np.asarray(env.is_solved(s))[0]
    s2 = make_state(env, (5, 5), boxes=[(2, 2)], goals=[(3, 3)])
    assert not np.asarray(env.is_solved(s2))[0]


def test_encode_shape_and_planes(env):
    s = make_state(env, (1, 2), boxes=[(3, 4)], walls=[(5, 6)], goals=[(7, 8)])
    enc = np.asarray(env.encode(s))[0]
    assert enc.shape == (400,)
    agent_p, walls_p, boxes_p, goals_p = enc.reshape(4, 100)
    assert agent_p[1 * DIM + 2] == 1 and agent_p.sum() == 1
    assert walls_p[5 * DIM + 6] == 1
    assert boxes_p[3 * DIM + 4] == 1
    assert goals_p[7 * DIM + 8] == 1


def _load_ref_boards(reference_path):
    import os
    import pickle

    for rel in ("data/sokoban/train/data_0.pkl", "data/sokoban/data_0.pkl"):
        p = os.path.join(reference_path, rel)
        if os.path.exists(p):
            with open(p, "rb") as f:
                return pickle.load(f)
    raise FileNotFoundError("sokoban seed boards not found in reference")


def test_hindsight_generation(reference_path, env):
    grid = _load_ref_boards(reference_path)
    env.set_boards(load_boards_from_grid(np.asarray(grid)))
    states, depths = env.generate_scrambles(jax.random.PRNGKey(0), 64, 20)
    assert states.shape == (64, env.state_width)
    _, boxes, _, goals = env.unpack(states)
    # each state has num_boxes boxes and num_boxes goal cells
    np.testing.assert_array_equal(np.asarray(boxes).sum(1), 4)
    np.testing.assert_array_equal(np.asarray(goals).sum(1), 4)
    # depth-0 states are already solved (goals = final boxes = current boxes)
    solved = np.asarray(env.is_solved(states))
    d = np.asarray(depths)
    assert np.all(solved[d == 0])


def test_astar_solves_crafted_board(env):
    """End-to-end: BWAS with zero heuristic finds the known 3-move optimum
    (right, push down, push down) on a crafted board — exercises per-state
    goals flowing through search (SURVEY §7 hard part)."""
    from tests.test_astar import zero_heuristic_model

    from deepcubea_tpu.search import AStarConfig, BatchWeightedAStar
    from deepcubea_tpu.utils import is_valid_solution

    model, params, stats = zero_heuristic_model(env)
    s = make_state(env, (1, 1), boxes=[(2, 2)], goals=[(4, 2)])
    cfg = AStarConfig(weight=1.0, batch_size=8, pool_capacity=1 << 12,
                      table_capacity=1 << 13, max_path_len=32)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve(s, max_iters=50)
    assert res.solutions[0] is not None
    assert len(res.solutions[0]) == 3
    assert is_valid_solution(env, np.asarray(s)[0], res.solutions[0])


def test_parity_with_reference(reference_path, env):
    from environments.sokoban import Sokoban as RefSokoban, SokobanState

    # build the reference env without its data-file-loading __init__
    ref = RefSokoban.__new__(RefSokoban)
    ref.dim, ref.num_boxes, ref.num_moves = 10, 4, 4

    grid = np.asarray(_load_ref_boards(reference_path))
    boards = load_boards_from_grid(grid)
    env.set_boards(boards)

    # build matching ref states + our packed states for the first 32 boards
    n = 32
    ref_states = []
    for i in range(n):
        ref_states.append(SokobanState(
            boards["agent"][i].astype(np.int64),
            boards["boxes"][i].reshape(10, 10).astype(bool),
            boards["walls"][i].reshape(10, 10).astype(bool),
            boards["goals"][i].reshape(10, 10).astype(bool)))
    ours = env.pack(boards["agent"][:n], boards["boxes"][:n],
                    boards["walls"][:n], boards["goals"][:n])

    rng = np.random.RandomState(0)
    for t in range(30):
        a = int(rng.randint(0, 4))
        ref_states, _ = ref.next_state(ref_states, a)
        ours = env.step(ours, jnp.full((n,), a, jnp.int32))
        agent, boxes, walls, goals = env.unpack(ours)
        ref_agent = np.stack([s.agent for s in ref_states])
        ref_boxes = np.stack([s.boxes.reshape(-1) for s in ref_states])
        np.testing.assert_array_equal(np.asarray(agent), ref_agent,
                                      err_msg=f"agent mismatch at step {t}")
        np.testing.assert_array_equal(np.asarray(boxes).astype(bool), ref_boxes,
                                      err_msg=f"boxes mismatch at step {t}")
