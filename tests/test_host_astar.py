"""Hybrid host/device BWAS (C++ runtime via ctypes): same BFS-optimality
oracle as the device engine, plus device-vs-host cross-check."""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcubea_tpu.envs import LightsOut
from deepcubea_tpu.models import build_model, init_variables
from deepcubea_tpu.utils import bfs_distances, is_valid_solution

gxx = shutil.which("g++") or shutil.which("gcc")
pytestmark = pytest.mark.skipif(gxx is None, reason="no C++ toolchain")


def zero_heuristic_model(env):
    cfg = dict(env.nnet_config)
    cfg.update(h1_dim=16, resnet_dim=16, num_resnet_blocks=1)
    model = build_model(cfg)
    params, stats = init_variables(
        model, jax.random.PRNGKey(0),
        env.encode(jnp.zeros((2, env.state_width), jnp.uint8)))
    params["fc_out"]["kernel"] = jnp.zeros_like(params["fc_out"]["kernel"])
    params["fc_out"]["bias"] = jnp.zeros_like(params["fc_out"]["bias"])
    return model, params, stats


@pytest.fixture(scope="module")
def lo2():
    env = LightsOut(2)
    model, params, stats = zero_heuristic_model(env)
    return env, model, params, stats


def test_native_builds_and_loads():
    from deepcubea_tpu.search.host_astar import load_native
    lib = load_native()
    assert lib.dca_omp_threads() >= 1


def test_host_astar_optimal(lo2):
    from deepcubea_tpu.search.host_astar import HostAStar

    env, model, params, stats = lo2
    dist = bfs_distances(env)
    solver = HostAStar(env, model, params, stats, weight=1.0, batch_size=4,
                       table_capacity=1 << 10)
    for key, d in list(dist.items())[:8]:
        state = np.frombuffer(key, dtype=np.uint8)
        res = solver.solve_one(state, max_iters=100)
        assert res.solutions[0] is not None
        assert len(res.solutions[0]) == d
        assert is_valid_solution(env, state, res.solutions[0])


def test_host_matches_device_engine(lo2):
    """Byte-exact host dedup vs fingerprint device dedup must agree on
    solution costs (weight 1, zero heuristic => both optimal)."""
    from deepcubea_tpu.search import AStarConfig, BatchWeightedAStar
    from deepcubea_tpu.search.host_astar import HostAStar

    env, model, params, stats = lo2
    dist = bfs_distances(env)
    states = np.stack([np.frombuffer(k, np.uint8) for k in dist])[:8]

    dev = BatchWeightedAStar(env, model, params, stats,
                             AStarConfig(weight=1.0, batch_size=4,
                                         pool_capacity=1 << 10,
                                         table_capacity=1 << 11,
                                         max_path_len=32))
    dev_res = dev.solve(jnp.asarray(states), max_iters=100)
    host = HostAStar(env, model, params, stats, weight=1.0, batch_size=4,
                     table_capacity=1 << 10)
    for i in range(states.shape[0]):
        host_res = host.solve_one(states[i], max_iters=100)
        assert len(host_res.solutions[0]) == len(dev_res.solutions[i])
