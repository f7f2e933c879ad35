"""Shard loading, logger tee, checkpoint round-trip, phase timer,
sokoban terminal renderer."""

import os
import pickle

import jax
import numpy as np

from deepcubea_tpu.envs import LightsOut
from deepcubea_tpu.models import build_model, init_variables
from deepcubea_tpu.utils.checkpoint import (load_checkpoint,
                                            promote_to_target,
                                            save_checkpoint)
from deepcubea_tpu.utils.compat import load_states_from_files
from deepcubea_tpu.utils.logger import Logger
from deepcubea_tpu.utils.profiling import PhaseTimer


def test_load_states_from_files(tmp_path):
    env = LightsOut(3)
    for i in range(3):
        states, _ = env.generate_scrambles(jax.random.PRNGKey(i), 4, 2)
        with open(tmp_path / f"data_{i}.pkl", "wb") as f:
            pickle.dump({"states": np.asarray(states)}, f)
    out = load_states_from_files(str(tmp_path), env)
    assert out.shape == (12, 9)


def test_checkpoint_roundtrip_and_promote(tmp_path):
    env = LightsOut(3)
    cfg = dict(env.nnet_config)
    cfg.update(h1_dim=8, resnet_dim=8, num_resnet_blocks=1)
    model = build_model(cfg)
    params, stats = init_variables(model, jax.random.PRNGKey(0),
                                   env.encode(env.goal_states(2)))
    curr = str(tmp_path / "current")
    targ = str(tmp_path / "target")
    save_checkpoint(curr, params, stats, meta=dict(itr=7, update_num=2))
    ckpt = load_checkpoint(curr)
    assert ckpt["meta"]["itr"] == 7
    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(ckpt["params"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    promote_to_target(curr, targ)
    tgt = load_checkpoint(targ)
    assert tgt is not None and tgt["meta"]["update_num"] == 2
    assert load_checkpoint(str(tmp_path / "nope")) is None


def test_logger_tee(tmp_path, capsys):
    path = str(tmp_path / "out.txt")
    lg = Logger(path)
    lg.write("hello\n")
    lg.close()
    with open(path) as f:
        assert f.read() == "hello\n"


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("pop"):
        pass
    with t.phase("expand"):
        pass
    rep = t.report()
    assert "pop" in rep and "expand" in rep


def test_sokoban_render():
    from deepcubea_tpu.cli.play import render
    from deepcubea_tpu.envs import Sokoban

    env = Sokoban(10, 4)
    state = np.zeros((302,), np.uint8)
    state[0], state[1] = 5, 5         # agent
    state[2 + 3 * 10 + 3] = 1          # box at (3,3)
    state[2 + 100 + 0] = 1             # wall at (0,0)
    state[2 + 200 + 3 * 10 + 3] = 1    # goal under the box
    out = render(env, state)
    lines = out.splitlines()
    assert lines[0].split(" ")[0] == "#"
    assert lines[3].split(" ")[3] == "◉"
    assert lines[5].split(" ")[5] == "@"
