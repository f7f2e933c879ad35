"""Frontier-sharded single-instance BWAS on the 8-device mesh: optimal vs
BFS with zero heuristic, valid with an arbitrary heuristic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcubea_tpu.envs import LightsOut
from deepcubea_tpu.models import build_model, init_variables
from deepcubea_tpu.parallel import make_mesh
from deepcubea_tpu.search.astar_sharded import (ShardedAStar,
                                                ShardedAStarConfig)
from deepcubea_tpu.utils import bfs_distances, is_valid_solution
from tests.test_astar import zero_heuristic_model

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_frontier_sharded_optimal():
    env = LightsOut(2)
    model, params, stats = zero_heuristic_model(env)
    dist = bfs_distances(env)
    states = np.stack([np.frombuffer(s, np.uint8) for s in dist])
    dists = np.array([dist[s.tobytes()] for s in states])

    mesh = make_mesh(8, model_parallel=1)
    cfg = ShardedAStarConfig(weight=1.0, batch_size=16,
                             pool_capacity=1 << 11, table_capacity=1 << 12,
                             max_path_len=32)
    solver = ShardedAStar(env, model, params, stats, cfg, mesh)
    for i in range(min(8, states.shape[0])):
        res = solver.solve_one(jnp.asarray(states[i]), max_iters=64)
        assert res.solutions[0] is not None, f"instance {i} unsolved"
        assert len(res.solutions[0]) == dists[i], (
            f"instance {i}: got {len(res.solutions[0])}, optimal {dists[i]}")
        assert is_valid_solution(env, states[i], res.solutions[0])


@needs_8
def test_frontier_sharded_learned_heuristic():
    env = LightsOut(3)
    cfgm = dict(env.nnet_config)
    cfgm.update(h1_dim=32, resnet_dim=16, num_resnet_blocks=1)
    model = build_model(cfgm)
    params, stats = init_variables(model, jax.random.PRNGKey(7),
                                   env.encode(env.goal_states(2)))
    mesh = make_mesh(8, model_parallel=1)
    cfg = ShardedAStarConfig(weight=0.8, batch_size=32,
                             pool_capacity=1 << 13, table_capacity=1 << 14,
                             max_path_len=64)
    solver = ShardedAStar(env, model, params, stats, cfg, mesh)
    states, _ = env.generate_scrambles(jax.random.PRNGKey(8), 4, 4)
    for i in range(4):
        res = solver.solve_one(states[i], max_iters=200)
        assert res.solutions[0] is not None
        assert is_valid_solution(env, np.asarray(states[i]),
                                 res.solutions[0])


@needs_8
def test_frontier_sharded_tight_route_slack_drops_counted():
    """A staging cap below the mean routing occupancy must drop (and count)
    children, not corrupt the search: solutions stay valid."""
    env = LightsOut(3)
    model, params, stats = zero_heuristic_model(env)
    mesh = make_mesh(8, model_parallel=1)
    cfg = ShardedAStarConfig(weight=1.0, batch_size=64,
                             pool_capacity=1 << 13, table_capacity=1 << 14,
                             max_path_len=64, route_slack=0.1)
    solver = ShardedAStar(env, model, params, stats, cfg, mesh)
    states, _ = env.generate_scrambles(jax.random.PRNGKey(9), 3, 4)
    dropped_any = 0
    for i in range(3):
        res = solver.solve_one(states[i], max_iters=300)
        assert res.solutions[0] is not None
        assert is_valid_solution(env, np.asarray(states[i]),
                                 res.solutions[0])
        dropped_any += int(res.pool_dropped[0])
    assert dropped_any > 0  # the tight cap really dropped something
