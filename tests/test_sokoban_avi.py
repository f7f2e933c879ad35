"""AVI training loop on sokoban (hindsight goals, dense encoder, no
goal_states): the full trainer must run on synthetic seed boards."""

import numpy as np
import pytest

from deepcubea_tpu.envs import Sokoban
from deepcubea_tpu.models import build_model
from deepcubea_tpu.training import AVIConfig, AVITrainer


def synthetic_boards(n=4, dim=10, boxes=2):
    rng = np.random.RandomState(0)
    out = dict(agent=np.zeros((n, 2), np.uint8),
               boxes=np.zeros((n, dim * dim), np.uint8),
               walls=np.zeros((n, dim * dim), np.uint8),
               goals=np.zeros((n, dim * dim), np.uint8))
    for i in range(n):
        # border walls
        w = np.zeros((dim, dim), np.uint8)
        w[0, :] = w[-1, :] = w[:, 0] = w[:, -1] = 1
        out["walls"][i] = w.reshape(-1)
        cells = rng.choice(np.flatnonzero(w.reshape(-1) == 0), boxes + 1,
                           replace=False)
        out["agent"][i] = divmod(int(cells[0]), dim)
        out["boxes"][i][cells[1:]] = 1
        out["goals"][i][cells[1:]] = 1  # initial goals == boxes
    return out


def test_sokoban_avi_update_runs():
    env = Sokoban(10, 2, boards=synthetic_boards())
    cfg = dict(env.nnet_config)
    cfg.update(h1_dim=32, resnet_dim=16, num_resnet_blocks=1)
    model = build_model(cfg)
    avi_cfg = AVIConfig(back_max=4, batch_size=32, states_per_update=64,
                        loss_thresh=10.0, num_test=12, log_every=2)
    t = AVITrainer(env, avi_cfg, seed=0, model=model, log=lambda *a: None)
    loss = t.run_update()
    assert np.isfinite(loss)
    t.maybe_swap_target()
    loss = t.run_update()  # with a real target net
    assert np.isfinite(loss)
    stats = t.evaluate()
    assert stats[0]["per_solved"] == 100.0
