"""NPuzzle kernel: hand-checked transitions, no-op blocked moves, parity
with the reference (environments/n_puzzle.py:174-231)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcubea_tpu.envs import NPuzzle


@pytest.fixture(scope="module", params=[3, 4])
def env(request):
    return NPuzzle(request.param)


def test_goal_and_solved(env):
    n2 = env.dim ** 2
    goals = env.goal_states(3)
    np.testing.assert_array_equal(
        np.asarray(goals[0]), np.concatenate([np.arange(1, n2), [0]]))
    assert np.all(np.asarray(env.is_solved(goals)))


def test_blocked_moves_are_noops(env):
    # blank starts bottom-right: U (tile below moves up) is blocked? blank at
    # last cell: moves that would pull from outside the board are no-ops.
    goals = env.goal_states(1)
    # action U swaps blank with the cell below it -> blank at bottom row: no-op
    nxt = env.step(goals, jnp.array([0], jnp.int32))
    np.testing.assert_array_equal(np.asarray(nxt), np.asarray(goals))
    # action L swaps blank with cell to its right -> blank at last col: no-op
    nxt = env.step(goals, jnp.array([2], jnp.int32))
    np.testing.assert_array_equal(np.asarray(nxt), np.asarray(goals))


def test_hand_transition(env):
    n = env.dim
    goals = env.goal_states(1)
    # action D: blank swaps with the tile above it
    nxt = np.asarray(env.step(goals, jnp.array([1], jnp.int32)))[0]
    expect = np.concatenate([np.arange(1, n * n), [0]])
    expect[-1], expect[-1 - n] = expect[-1 - n], expect[-1]
    np.testing.assert_array_equal(nxt, expect)


def test_move_inverse_identity(env):
    # holds only for non-blocked moves: blocked moves are no-ops whose
    # "reverse" is a real move (reference n_puzzle.py:211-212 semantics)
    key = jax.random.PRNGKey(0)
    states, _ = env.generate_scrambles(key, 64, 30)
    states_np = np.asarray(states)
    z = np.argmax(states_np == 0, axis=1)
    for a in range(4):
        not_blocked = env._swap_np[z, a] != z
        acts = jnp.full((64,), a, dtype=jnp.int32)
        back = np.asarray(
            env.step(env.step(states, acts), env.reverse_action_map[acts]))
        np.testing.assert_array_equal(back[not_blocked],
                                      states_np[not_blocked])


def test_states_remain_permutations(env):
    states, _ = env.generate_scrambles(jax.random.PRNGKey(1), 128, 50)
    s = np.sort(np.asarray(states), axis=1)
    np.testing.assert_array_equal(
        s, np.tile(np.arange(env.dim ** 2), (128, 1)))


def test_parity_with_reference(reference_path, env):
    from environments.n_puzzle import NPuzzle as RefNPuzzle

    ref = RefNPuzzle(env.dim)
    np.testing.assert_array_equal(env._swap_np, ref.swap_zero_idxs)

    rng = np.random.RandomState(3)
    states_np = np.stack([rng.permutation(env.dim ** 2) for _ in range(32)])
    states_np = states_np.astype(np.uint8)
    _, z_idxs = np.where(states_np == 0)
    for a in range(4):
        ref_next, _, _ = ref._move_np(states_np.copy(), z_idxs.copy(), a)
        ours = np.asarray(env.step(jnp.asarray(states_np),
                                   jnp.full((32,), a, jnp.int32)))
        np.testing.assert_array_equal(ours, ref_next.astype(np.uint8))
