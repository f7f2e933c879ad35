"""Cube4 (24 layered moves, C++-only in the reference,
cpp/environments.h:125-145): permutation-group properties and face-uniform
solved semantics. No Python oracle exists upstream, so correctness rests on
group-theoretic invariants rather than transition parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcubea_tpu.envs import Cube4, get_environment


@pytest.fixture(scope="module")
def env():
    return Cube4()


def test_registry(env):
    assert get_environment("cube4").num_actions == 24


def test_moves_are_permutations(env):
    assert env._perms_np.shape == (24, 96)
    for p in env._perms_np:
        assert sorted(p.tolist()) == list(range(96))


def test_order_four_and_inverse(env):
    goal = env.goal_states(1)
    for a in range(24):
        acts = jnp.full((1,), a, jnp.int32)
        s = goal
        for _ in range(4):
            s = env.step(s, acts)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(goal))
        s1 = env.step(goal, acts)
        assert not np.array_equal(np.asarray(s1), np.asarray(goal))
        back = env.step(s1, env.reverse_action_map[acts])
        np.testing.assert_array_equal(np.asarray(back), np.asarray(goal))


def test_layers_of_same_face_disjoint(env):
    goal = env.goal_states(1)
    outer = jnp.full((1,), 0, jnp.int32)
    inner = jnp.full((1,), 1, jnp.int32)
    oi = env.step(env.step(goal, outer), inner)
    io = env.step(env.step(goal, inner), outer)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(io))


def test_face_uniform_solved(env):
    goal = env.goal_states(2)
    assert np.asarray(env.is_solved(goal)).all()
    # an inner-slice move breaks face uniformity
    moved = env.step(goal, jnp.ones((2,), jnp.int32))
    assert not np.asarray(env.is_solved(moved)).any()


def test_scramble_depth_zero_solved(env):
    states, depths = env.generate_scrambles(jax.random.PRNGKey(0), 128, 8)
    solved = np.asarray(env.is_solved(states))
    d = np.asarray(depths)
    assert solved[d == 0].all()
    assert solved[d >= 4].mean() < 0.2
