"""Value network: shapes, BN train/eval behavior, parameter-count parity
with the reference architecture (utils/pytorch_models.py:5-86)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcubea_tpu.envs import Cube3
from deepcubea_tpu.models import (build_model, count_params, forward_eval,
                                  forward_train, init_variables)


@pytest.fixture(scope="module")
def setup():
    env = Cube3()
    model = build_model(env.nnet_config)
    params, stats = init_variables(model, jax.random.PRNGKey(0),
                                   env.encode(env.goal_states(2)))
    return env, model, params, stats


def test_output_shape(setup):
    env, model, params, stats = setup
    x = env.encode(env.goal_states(8))
    out = forward_eval(model, params, stats, x)
    assert out.shape == (8,)
    assert out.dtype == jnp.float32


def test_param_count_matches_reference_architecture(setup):
    env, model, params, stats = setup
    # hand count for (324 -> 5000 -> 1000 -> 4 res blocks -> 1) with BN
    expect = (324 * 5000 + 5000) + 2 * 5000
    expect += (5000 * 1000 + 1000) + 2 * 1000
    expect += 4 * (2 * (1000 * 1000 + 1000) + 2 * 2 * 1000)
    expect += 1000 + 1
    assert count_params(params) == expect


def test_param_count_matches_torch(setup):
    torch = pytest.importorskip("torch")
    env, model, params, stats = setup
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from utils.pytorch_models import ResnetModel
    except Exception:
        pytest.skip("reference model unavailable")
    ref = ResnetModel(54, 6, 5000, 1000, 4, 1, True)
    ref_n = sum(p.numel() for p in ref.parameters())
    assert count_params(params) == ref_n


def test_bn_train_updates_stats(setup):
    env, model, params, stats = setup
    x = env.encode(env.goal_states(16))
    _, new_stats = forward_train(model, params, stats, x)
    leaves_old = jax.tree_util.tree_leaves(stats)
    leaves_new = jax.tree_util.tree_leaves(new_stats)
    changed = any(not np.allclose(a, b) for a, b in zip(leaves_old, leaves_new))
    assert changed


def test_eval_deterministic(setup):
    env, model, params, stats = setup
    key = jax.random.PRNGKey(1)
    s, _ = env.generate_scrambles(key, 8, 10)
    x = env.encode(s)
    a = forward_eval(model, params, stats, x)
    b = forward_eval(model, params, stats, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
