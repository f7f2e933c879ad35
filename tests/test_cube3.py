"""Cube3 kernel: permutation-group properties + exact parity with the
reference's move tables (environments/cube3.py:163-256)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcubea_tpu.envs import Cube3
from deepcubea_tpu.envs.cube3 import build_move_permutations


@pytest.fixture(scope="module")
def env():
    return Cube3()


def test_moves_are_permutations(env):
    perms = build_move_permutations(3)
    assert perms.shape == (12, 54)
    for p in perms:
        assert sorted(p.tolist()) == list(range(54))


def test_move_inverse_identity(env):
    key = jax.random.PRNGKey(0)
    states, _ = env.generate_scrambles(key, 32, 20)
    for a in range(12):
        acts = jnp.full((32,), a, dtype=jnp.int32)
        back = env.step(env.step(states, acts), env.reverse_action_map[acts])
        np.testing.assert_array_equal(np.asarray(back), np.asarray(states))


def test_quarter_turn_order_four(env):
    states = env.goal_states(4)
    for a in range(12):
        acts = jnp.full((4,), a, dtype=jnp.int32)
        s = states
        for _ in range(4):
            s = env.step(s, acts)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(states))
        # ... and not earlier
        s1 = env.step(states, acts)
        assert not np.array_equal(np.asarray(s1), np.asarray(states))


def test_opposite_faces_commute(env):
    # U and D act on disjoint stickers: orders must commute
    states, _ = env.generate_scrambles(jax.random.PRNGKey(1), 8, 15)
    u = jnp.full((8,), 1, dtype=jnp.int32)  # U1
    d = jnp.full((8,), 3, dtype=jnp.int32)  # D1
    ud = env.step(env.step(states, u), d)
    du = env.step(env.step(states, d), u)
    np.testing.assert_array_equal(np.asarray(ud), np.asarray(du))


def test_expand_matches_step(env):
    states, _ = env.generate_scrambles(jax.random.PRNGKey(2), 16, 10)
    children, tc = env.expand(states)
    assert children.shape == (16, 12, 54)
    np.testing.assert_array_equal(np.asarray(tc), np.ones((16, 12)))
    for a in range(12):
        acts = jnp.full((16,), a, dtype=jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(children[:, a]), np.asarray(env.step(states, acts)))


def test_is_solved_and_goal(env):
    goals = env.goal_states(5)
    assert np.all(np.asarray(env.is_solved(goals)))
    moved = env.step(goals, jnp.zeros((5,), jnp.int32))
    assert not np.any(np.asarray(env.is_solved(moved)))


def test_encode_colors(env):
    goals = env.goal_states(2)
    enc = np.asarray(env.encode(goals))
    assert enc.shape == (2, 54)
    np.testing.assert_array_equal(enc[0], np.repeat(np.arange(6), 9))


def test_scramble_depth_zero_is_goal(env):
    states, depths = env.generate_scrambles(jax.random.PRNGKey(3), 256, 12)
    solved = np.asarray(env.is_solved(states))
    d = np.asarray(depths)
    assert np.all(solved[d == 0])
    # most depth>=5 scrambles should not be solved
    assert solved[d >= 5].mean() < 0.1


def test_parity_with_reference_tables(reference_path, env):
    """Our (12, 54) permutation table must reproduce the reference's
    rotate_idxs_new/old scatter semantics exactly."""
    from environments.cube3 import Cube3 as RefCube3

    ref = RefCube3()
    ours = build_move_permutations(3)
    for a, move in enumerate(ref.moves):
        ref_perm = np.arange(54)
        ref_perm[ref.rotate_idxs_new[move]] = ref.rotate_idxs_old[move]
        np.testing.assert_array_equal(
            ours[a], ref_perm,
            err_msg=f"move {move} (action {a}) table mismatch")


def test_parity_with_reference_transitions(reference_path, env, rng):
    from environments.cube3 import Cube3 as RefCube3, Cube3State

    ref = RefCube3()
    states_np = np.stack([np.random.RandomState(i).permutation(54)
                          for i in range(16)]).astype(np.uint8)
    for a in range(12):
        ref_next, _ = ref._move_np(states_np.copy(), a)
        ours = np.asarray(env.step(jnp.asarray(states_np),
                                   jnp.full((16,), a, jnp.int32)))
        np.testing.assert_array_equal(ours, ref_next)


def test_scramble_generation_fixed_seed_golden(env):
    """Regression guard: scramble generation is deterministic under a fixed
    PRNG key (SURVEY.md §4 'fixed-seed golden tests'). The digest pins the
    jax.random stream + scan semantics on the CPU backend; depths are
    uniform on [0, back_max] and every state is reachable within its depth.
    If a jax upgrade rotates the PRNG stream this digest moves — re-pin it
    after confirming the distribution checks still hold."""
    import hashlib

    import jax

    states, depths = env.generate_scrambles(jax.random.PRNGKey(1234), 512, 30)
    states, depths = np.asarray(states), np.asarray(depths)
    assert hashlib.sha256(states.tobytes()).hexdigest()[:16] == \
        "6a6ceb7b3925584d"
    assert depths.min() == 0 and depths.max() == 30
    assert abs(depths.mean() - 15.0) < 1.5
    # depth-0 states are the goal exactly
    goal = np.arange(54, dtype=np.uint8)
    assert (states[depths == 0] == goal).all()
