"""Search-frontier sharding: instances distributed over the 8-device mesh
solve identically to the single-device engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcubea_tpu.envs import LightsOut
from deepcubea_tpu.parallel import make_mesh
from deepcubea_tpu.search import AStarConfig, BatchWeightedAStar
from deepcubea_tpu.utils import bfs_distances, is_valid_solution
from tests.test_astar import zero_heuristic_model

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_sharded_instances_optimal():
    env = LightsOut(2)
    model, params, stats = zero_heuristic_model(env)
    dist = bfs_distances(env)
    states = np.stack([np.frombuffer(k, np.uint8) for k in dist])[:8]
    dists = np.array([dist[s.tobytes()] for s in states])

    mesh = make_mesh(8, model_parallel=1)
    cfg = AStarConfig(weight=1.0, batch_size=4, pool_capacity=1 << 10,
                      table_capacity=1 << 11, max_path_len=32)
    solver = BatchWeightedAStar(env, model, params, stats, cfg, mesh=mesh)
    res = solver.solve(jnp.asarray(states), max_iters=100)
    for i in range(8):
        assert res.solutions[i] is not None
        assert len(res.solutions[i]) == dists[i]
        assert is_valid_solution(env, states[i], res.solutions[i])
