"""Cross-check against the reference's shipped artifacts: its pickled test
states load without importing the reference, and its OPTIMAL SOLUTIONS
replay to solved under OUR dynamics — the strongest possible proof that the
move conventions match (SURVEY.md §7 'Exact-match parity')."""

import os

import numpy as np
import pytest

from deepcubea_tpu.envs import get_environment
from deepcubea_tpu.utils import is_valid_solution
from deepcubea_tpu.utils.compat import load_test_set


def _test_path(reference_path, env_name):
    p = os.path.join(reference_path, "data", env_name, "test", "data_0.pkl")
    if not os.path.exists(p):
        pytest.skip(f"no test pickle for {env_name}")
    return p


@pytest.mark.parametrize("env_name", ["cube3", "puzzle15", "puzzle24"])
def test_reference_solutions_replay_solved(reference_path, env_name):
    env = get_environment(env_name)
    data = load_test_set(_test_path(reference_path, env_name), env)
    states = data["states"]
    sols = data.get("solutions")
    assert states.shape[1] == env.state_width
    assert sols is not None
    n_check = 20
    for i in range(n_check):
        assert is_valid_solution(env, states[i], sols[i]), (
            f"{env_name} state {i}: reference optimal solution does not "
            f"solve under our dynamics")


@pytest.mark.parametrize("env_name", ["puzzle35", "puzzle48", "lightsout7"])
def test_reference_states_load(reference_path, env_name):
    env = get_environment(env_name)
    data = load_test_set(_test_path(reference_path, env_name), env)
    assert data["states"].shape[1] == env.state_width
    assert data["states"].shape[0] >= 100


def test_sokoban_states_load(reference_path):
    env = get_environment("sokoban")
    data = load_test_set(_test_path(reference_path, "sokoban"), env)
    states = data["states"]
    assert states.shape[1] == env.state_width
    # sanity: 4 boxes and 4 goals per state
    _, boxes, _, goals = env.unpack(states[:50])
    np.testing.assert_array_equal(np.asarray(boxes).sum(1), 4)
    np.testing.assert_array_equal(np.asarray(goals).sum(1), 4)
