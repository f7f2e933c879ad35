"""Mixing-chain scramble pool: tiling invariants and distribution parity
with the fresh-walk generator (the reference's semantics,
environment_abstract.py:88-125)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepcubea_tpu.envs import get_environment
from deepcubea_tpu.training.scramble_pool import ScramblePool


def _depth_histogram(depths, back_max):
    return np.bincount(np.asarray(depths), minlength=back_max + 1)


def test_depth_tiling_exact_through_advances():
    env = get_environment("cube3")
    back_max = 9
    pool = ScramblePool(env, back_max, ScramblePool.auto_chains(16, back_max))
    assert pool.num_chains % (back_max + 1) == 0
    st = pool.init(jax.random.PRNGKey(0))
    per = pool.num_chains // (back_max + 1)
    key = jax.random.PRNGKey(1)
    for _ in range(2 * (back_max + 1) + 3):  # through >2 full reset cycles
        assert (_depth_histogram(st.depths, back_max) == per).all()
        key, k = jax.random.split(key)
        st = pool.advance(st, k)


def test_depth_zero_is_goal_and_depths_are_walk_lengths():
    env = get_environment("puzzle15")
    back_max = 6
    pool = ScramblePool(env, back_max, (back_max + 1) * 8)
    st = pool.init(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)
    for _ in range(back_max + 2):
        key, k = jax.random.split(key)
        st = pool.advance(st, k)
    zero = np.asarray(st.depths) == 0
    assert zero.any()
    solved = np.asarray(env.is_solved(st.states))
    assert solved[zero].all()
    # a depth-d walk can't be further from goal than d tiles displaced
    dist = (np.asarray(st.states) != np.asarray(env.goal_states(1))[0]).sum(1)
    assert (dist <= 2 * np.asarray(st.depths)).all()  # one swap moves 2 cells


def test_sample_matches_fresh_walk_distribution():
    """Per-depth mean Hamming distance to goal of pool samples tracks the
    fresh generator's within a few percent — same walk distribution."""
    env = get_environment("cube3")
    back_max = 8
    pool = ScramblePool(env, back_max, (back_max + 1) * 400)
    st = pool.init(jax.random.PRNGKey(4))
    key = jax.random.PRNGKey(5)
    for _ in range(back_max + 5):  # decorrelate from the warm-start scan
        key, k = jax.random.split(key)
        st = pool.advance(st, k)
    goal = np.asarray(env.goal_states(1))[0]

    pool_states = np.asarray(st.states)
    pool_depths = np.asarray(st.depths)

    n = 4000
    depths = jax.random.randint(jax.random.PRNGKey(6), (n,), 0, back_max + 1)
    fresh, _ = env.generate_scrambles(jax.random.PRNGKey(7), n, back_max,
                                      depths=depths)
    fresh = np.asarray(fresh)
    fresh_depths = np.asarray(depths)

    for d in range(back_max + 1):
        pd = (pool_states[pool_depths == d] != goal).mean(axis=1).mean()
        fd = (fresh[fresh_depths == d] != goal).mean(axis=1).mean()
        assert abs(pd - fd) < 0.06, (d, pd, fd)


def test_trainer_integration_with_pool():
    from deepcubea_tpu.training import AVIConfig, AVITrainer
    from deepcubea_tpu.models import build_model

    env = get_environment("lightsout7")
    cfg = AVIConfig(back_max=5, batch_size=16, states_per_update=48,
                    num_test=8, loss_thresh=100.0, scramble_pool=-1)
    nc = dict(env.nnet_config)
    nc.update(h1_dim=32, resnet_dim=16, num_resnet_blocks=1)
    t = AVITrainer(env, cfg, model=build_model(nc), log=lambda *a: None)
    assert t.pool is not None
    loss = t.run_update()
    assert np.isfinite(loss)
    assert t.pool_state is not None
    # pool advanced once per iteration
    assert int(t.itr) == 3


def _sokoban_env(n_boards=8):
    import pickle

    from deepcubea_tpu.envs.sokoban import load_boards_from_grid

    env = get_environment("sokoban")
    with open("/root/reference/data/sokoban/data_0.pkl", "rb") as f:
        grid = np.asarray(pickle.load(f))
    env.set_boards(load_boards_from_grid(grid[:n_boards]))
    return env


def test_sokoban_uses_two_stage_pool():
    from deepcubea_tpu.envs.sokoban import SokobanScramblePool
    from deepcubea_tpu.training import AVIConfig, AVITrainer
    from deepcubea_tpu.models import build_model

    env = _sokoban_env()
    cfg = AVIConfig(back_max=4, batch_size=8, states_per_update=16,
                    num_test=4, loss_thresh=100.0, scramble_pool=-1)
    nc = dict(env.nnet_config)
    nc.update(h1_dim=32, resnet_dim=16, num_resnet_blocks=1)
    t = AVITrainer(env, cfg, model=build_model(nc), log=lambda *a: None)
    assert isinstance(t.pool, SokobanScramblePool)
    loss = t.run_update()
    assert np.isfinite(loss)


def test_sokoban_pool_matches_hindsight_distribution():
    """Pool samples at depth d track the fresh hindsight generator: valid
    walls/boxes invariants, depth-0 solved, and a similar solved-fraction
    profile by depth."""
    env = _sokoban_env(16)
    back_max = 6
    pool = env.make_scramble_pool(back_max, (back_max + 1) * 128)
    st = pool.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for _ in range(2 * (back_max + 1) + 5):  # through resets + stage A
        key, k = jax.random.split(key)
        st = pool.advance(st, k)
    key, k = jax.random.split(key)
    samples, depths = pool.sample(st, k, 2048)
    samples, depths = np.asarray(samples), np.asarray(depths)
    assert (depths >= 0).all() and (depths <= back_max).all()
    # depth 0: goals == boxes by construction -> solved
    solved = np.asarray(env.is_solved(jnp.asarray(samples)))
    assert solved[depths == 0].all()
    # every sample has the right box/goal count and walls from a seed board
    _, boxes, walls, goals = env.unpack(jnp.asarray(samples))
    assert (np.asarray(boxes).sum(1) == env.num_boxes).all()
    assert (np.asarray(goals).sum(1) == env.num_boxes).all()

    fresh, fdep = env.generate_scrambles(jax.random.PRNGKey(2), 2048,
                                         back_max)
    fsolved = np.asarray(env.is_solved(fresh))
    fdep = np.asarray(fdep)
    for d in range(back_max + 1):
        a = solved[depths == d].mean()
        b = fsolved[fdep == d].mean()
        assert abs(a - b) < 0.15, (d, a, b)
