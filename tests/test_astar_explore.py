"""A*-exploration labeler (reference updaters/updater.py:36-54)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepcubea_tpu.envs import LightsOut
from deepcubea_tpu.models import build_model, init_variables
from deepcubea_tpu.training import AVIConfig, AVITrainer
from deepcubea_tpu.training.astar_explore import astar_explore


def setup():
    env = LightsOut(3)
    cfg = dict(env.nnet_config)
    cfg.update(h1_dim=32, resnet_dim=16, num_resnet_blocks=1)
    model = build_model(cfg)
    params, stats = init_variables(model, jax.random.PRNGKey(0),
                                   env.encode(env.goal_states(2)))
    return env, model, params, stats


def test_shapes_and_validity():
    env, model, params, stats = setup()
    states, _ = env.generate_scrambles(jax.random.PRNGKey(1), 8, 3)
    weights = jax.random.uniform(jax.random.PRNGKey(2), (8,))
    res = astar_explore(env, model, params, stats, states, weights, 5)
    assert res.traj_states.shape == (5, 8, 9)
    assert res.traj_ctg.shape == (5, 8)
    # first pop is always the root: labeled, valid
    np.testing.assert_array_equal(np.asarray(res.traj_valid[0]), True)
    np.testing.assert_array_equal(np.asarray(res.traj_states[0]),
                                  np.asarray(states))


def test_goal_root_labeled_zero_and_found():
    env, model, params, stats = setup()
    goals = env.goal_states(4)
    weights = jnp.full((4,), 0.5)
    res = astar_explore(env, model, params, stats, goals, weights, 3)
    np.testing.assert_array_equal(np.asarray(res.traj_ctg[0]), 0.0)
    assert np.asarray(res.is_solved).all()


def test_avi_trains_with_astar_update():
    env, model, params, stats = setup()
    cfg = AVIConfig(back_max=3, batch_size=64, states_per_update=128,
                    loss_thresh=10.0, num_test=12, max_update_steps=4,
                    update_method="astar", log_every=2)
    t = AVITrainer(env, cfg, seed=0, model=model, log=lambda *a: None)
    t.run_update()          # update 0: num_steps=1 (all_zeros path)
    t.maybe_swap_target()
    loss = t.run_update()   # update 1: num_steps=2, astar explorer
    assert np.isfinite(loss)


def test_instance_retires_after_goal_pop():
    # reference astar.py:262: an instance with goal_nodes is excluded from
    # every later step; the goal pop itself is the last valid label (0.0)
    env, model, params, stats = setup()
    goals = env.goal_states(4)
    weights = jnp.full((4,), 0.5)
    res = astar_explore(env, model, params, stats, goals, weights, 5)
    valid = np.asarray(res.traj_valid)
    np.testing.assert_array_equal(valid[0], True)    # goal pop labeled
    np.testing.assert_array_equal(valid[1:], False)  # then retired
    np.testing.assert_array_equal(np.asarray(res.traj_ctg[0]), 0.0)


def test_unsolvable_horizon_instances_stay_live():
    # deep scrambles under a random net: no goal popped in 4 steps, every
    # pop stays a valid labeled sample
    env, model, params, stats = setup()
    key = jax.random.PRNGKey(7)
    states, _ = env.generate_scrambles(
        key, 6, 8, depths=jnp.full((6,), 8, jnp.int32))
    unsolved = ~np.asarray(env.is_solved(states))
    weights = jax.random.uniform(jax.random.PRNGKey(8), (6,))
    res = astar_explore(env, model, params, stats, states, weights, 4)
    valid = np.asarray(res.traj_valid)
    solved_seen = np.zeros(6, bool)
    labels = np.asarray(res.traj_ctg)
    pops = np.asarray(res.traj_states)
    for k in range(4):
        for i in range(6):
            if unsolved[i] and not solved_seen[i]:
                assert valid[k, i]
            if valid[k, i] and env.is_solved(pops[k])[i]:
                solved_seen[i] = True
