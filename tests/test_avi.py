"""AVI learner: loss decreases, labels match Bellman semantics, target swap
and k-step exploration labeling behave per the reference
(ctg_approx/avi.py + updaters/updater.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcubea_tpu.envs import LightsOut, NPuzzle
from deepcubea_tpu.models import build_model, init_variables
from deepcubea_tpu.training import (AVIConfig, AVITrainer, bellman_backup,
                                    gbfs_run)


def tiny_model(env):
    cfg = dict(env.nnet_config)
    cfg.update(h1_dim=64, resnet_dim=32, num_resnet_blocks=1)
    return build_model(cfg)


@pytest.fixture(scope="module")
def trainer():
    env = LightsOut(3)
    cfg = AVIConfig(back_max=4, batch_size=128, states_per_update=1024,
                    loss_thresh=10.0, num_test=60, log_every=4)
    t = AVITrainer(env, cfg, seed=0, model=tiny_model(env), log=lambda *a: None)
    return t


def test_all_zeros_first_update(trainer):
    # before any target exists, labels are 1 - solved; a few iterations
    # should pull the net toward small positive values
    loss = trainer.run_update()
    assert np.isfinite(loss)
    assert trainer.itr == 8  # ceil(1024/128) = 8 iterations


def test_target_swap(trainer):
    assert trainer.target_params is None
    swapped = trainer.maybe_swap_target()
    assert swapped  # loss_thresh = 10 always passes
    assert trainer.target_params is not None
    assert trainer.update_num == 1


def test_second_update_uses_target(trainer):
    loss = trainer.run_update()
    assert np.isfinite(loss)
    # target stays frozen while current trains
    old = jax.tree_util.tree_leaves(trainer.target_params)[0]
    new = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_evaluate_buckets(trainer):
    stats = trainer.evaluate()
    assert 0 in stats
    # depth-0 states are solved states: 100% solved
    assert stats[0]["per_solved"] == 100.0


def test_loss_decreases_on_lightsout():
    env = LightsOut(3)
    cfg = AVIConfig(back_max=3, batch_size=256, states_per_update=4096,
                    loss_thresh=0.5, num_test=30, log_every=16)
    t = AVITrainer(env, cfg, seed=1, model=tiny_model(env), log=lambda *a: None)
    losses = []
    t._ensure_pool()
    chunk = t._get_chunk(1, True, 16)
    copy = lambda tr: jax.tree_util.tree_map(jnp.array, tr)  # noqa: E731
    for _ in range(4):
        t.key, k = jax.random.split(t.key)
        (t.state, t.pool_state), ls = chunk(
            t.state, t.pool_state, copy(t.state.params),
            copy(t.state.batch_stats), k)
        losses.append(float(ls.mean()))
    assert losses[-1] < losses[0]


def test_multistep_gbfs_update():
    env = LightsOut(3)
    cfg = AVIConfig(back_max=3, batch_size=64, states_per_update=128,
                    loss_thresh=10.0, num_test=12, max_update_steps=4,
                    eps_max=0.3, log_every=2)
    t = AVITrainer(env, cfg, seed=2, model=tiny_model(env),
                   log=lambda *a: None)
    t.run_update()           # update 0: num_steps = 1
    t.maybe_swap_target()
    loss = t.run_update()    # update 1: num_steps = 2, gbfs trajectories
    assert np.isfinite(loss)
    assert t.update_num == 1


def test_bellman_backup_solved_is_zero():
    env = NPuzzle(3)
    model = tiny_model(env)
    params, stats = init_variables(model, jax.random.PRNGKey(0),
                                   env.encode(env.goal_states(2)))
    goals = env.goal_states(4)
    y, child_costs, children = bellman_backup(env, model, params, stats, goals)
    np.testing.assert_array_equal(np.asarray(y), np.zeros(4))
    assert child_costs.shape == (4, 4)


def test_gbfs_traj_labels():
    env = LightsOut(3)
    model = tiny_model(env)
    params, stats = init_variables(model, jax.random.PRNGKey(0),
                                   env.encode(env.goal_states(2)))
    states, _ = env.generate_scrambles(jax.random.PRNGKey(2), 16, 3)
    res = gbfs_run(env, model, params, stats, states,
                   jnp.zeros((16,)), jax.random.PRNGKey(3), 4)
    assert res.traj_states.shape == (4, 16, 9)
    assert res.traj_ctg.shape == (4, 16)
    # first step is always valid (every instance starts live)
    assert np.asarray(res.traj_valid)[0].all()
    # solved-at-start instances get a 0 label then go invalid
    solved0 = np.asarray(env.is_solved(states))
    if solved0.any():
        i = int(np.argmax(solved0))
        assert np.asarray(res.traj_ctg)[0, i] == 0.0
        assert not np.asarray(res.traj_valid)[1:, i].any()


def test_double_q_label_selection_vs_evaluation():
    """Double-Q: the label equals the TARGET value of the child the
    SELECTOR net picks — between plain-min (selector == target) and the
    plain backup with an independent selector, labels can only grow
    (min is the infimum over selections)."""
    env = LightsOut(4)
    model = tiny_model(env)
    params_t, stats_t = init_variables(model, jax.random.PRNGKey(1),
                                       env.encode(env.goal_states(2)))
    params_s, stats_s = init_variables(model, jax.random.PRNGKey(2),
                                       env.encode(env.goal_states(2)))
    states, _ = env.generate_scrambles(jax.random.PRNGKey(3), 32, 8)

    y_min, child_costs, _ = bellman_backup(env, model, params_t, stats_t,
                                           states, clip_zero=True)
    y_dq, _, _ = bellman_backup(env, model, params_t, stats_t, states,
                                clip_zero=True, sel_params=params_s,
                                sel_stats=stats_s)
    y_min, y_dq = np.asarray(y_min), np.asarray(y_dq)
    cc = np.asarray(child_costs)
    solved = np.asarray(env.is_solved(states))
    # every double-Q label is one of the target-evaluated child costs
    for i in range(32):
        if solved[i]:
            assert y_dq[i] == 0.0
        else:
            assert np.any(np.isclose(cc[i], y_dq[i], atol=1e-5))
    # and lower-bounded by the plain min backup
    assert np.all(y_dq >= y_min - 1e-5)
    # selector == target reproduces the plain min exactly
    y_same, _, _ = bellman_backup(env, model, params_t, stats_t, states,
                                  clip_zero=True, sel_params=params_t,
                                  sel_stats=stats_t)
    np.testing.assert_allclose(np.asarray(y_same), y_min, atol=1e-5)


def test_double_q_trainer_runs():
    env = LightsOut(3)
    cfg = AVIConfig(back_max=4, batch_size=128, states_per_update=512,
                    loss_thresh=10.0, num_test=30, log_every=4,
                    max_update_steps=4, update_method="astar", double_q=True)
    t = AVITrainer(env, cfg, seed=0, model=tiny_model(env),
                   log=lambda *a: None)
    t.run_update()          # all_zeros phase
    t.maybe_swap_target()
    loss = t.run_update()   # double-Q explorer phase
    assert np.isfinite(loss)
