"""LightsOut kernel: mask structure, self-inverse moves, parity with the
reference (environments/lights_out.py:33-43, 155-166)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcubea_tpu.envs import LightsOut


@pytest.fixture(scope="module")
def env():
    return LightsOut(7)


def test_mask_structure(env):
    masks = env._masks_np
    # interior cell toggles 5, corner 3, edge 4
    counts = masks.sum(axis=1).reshape(7, 7)
    assert counts[3, 3] == 5
    assert counts[0, 0] == 3
    assert counts[0, 3] == 4


def test_moves_self_inverse(env):
    states, _ = env.generate_scrambles(jax.random.PRNGKey(0), 64, 20)
    for a in [0, 6, 24, 48]:
        acts = jnp.full((64,), a, dtype=jnp.int32)
        back = env.step(env.step(states, acts), acts)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(states))


def test_moves_commute(env):
    # XOR dynamics are abelian
    states, _ = env.generate_scrambles(jax.random.PRNGKey(1), 16, 10)
    a = jnp.full((16,), 5, jnp.int32)
    b = jnp.full((16,), 30, jnp.int32)
    ab = env.step(env.step(states, a), b)
    ba = env.step(env.step(states, b), a)
    np.testing.assert_array_equal(np.asarray(ab), np.asarray(ba))


def test_solved(env):
    goals = env.goal_states(4)
    assert np.all(np.asarray(env.is_solved(goals)))
    nxt = env.step(goals, jnp.zeros((4,), jnp.int32))
    assert not np.any(np.asarray(env.is_solved(nxt)))


def test_parity_with_reference(reference_path, env):
    from environments.lights_out import LightsOut as RefLightsOut

    ref = RefLightsOut(7)
    rng = np.random.RandomState(5)
    states_np = (rng.rand(32, 49) < 0.5).astype(np.uint8)
    for a in [0, 3, 6, 21, 24, 42, 48]:
        ref_next, _ = ref._move_np(states_np.copy(), [a] * 32)
        ours = np.asarray(env.step(jnp.asarray(states_np),
                                   jnp.full((32,), a, jnp.int32)))
        np.testing.assert_array_equal(ours, ref_next)


def test_gf2_features_variant():
    """lightsout7gf2: encode appends the GF(2)-canonical press vector.
    Invariants: popcount(press) equals the oracle optimal cost, and move
    k flips exactly canonical bit k (docs/LIGHTSOUT_DEBUG.md round 5)."""
    import numpy as np
    from deepcubea_tpu.envs.registry import get_environment

    env = get_environment("lightsout7gf2")
    assert env.name == "lightsout7gf2"
    assert env.encoded_width == 98
    assert env.nnet_config["state_dim"] == 98
    rng = np.random.default_rng(7)
    s = rng.integers(0, 2, size=(32, 49)).astype(np.uint8)
    enc = np.asarray(env.encode(s))
    assert enc.shape == (32, 98)
    assert (enc[:, :49] == s).all()
    press = enc[:, 49:]
    assert (press.sum(axis=1) == env.optimal_costs(s)).all()
    k = 11
    s2 = np.asarray(env.step(s, np.full(32, k)))
    press2 = np.asarray(env.encode(s2))[:, 49:]
    d = press ^ press2
    assert (d.sum(axis=1) == 1).all() and (d[:, k] == 1).all()
    # search state untouched: step/is_solved identical to the raw env
    raw = get_environment("lightsout7")
    assert (np.asarray(raw.step(s, np.full(32, k))) == s2).all()
