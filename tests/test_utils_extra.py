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


def test_replay_states_matches_sequential():
    """replay_states (single fused scan; the r5 stream-latency fix) must
    byte-match the per-move env.step loop it replaced, across bucket
    boundaries (L=31/32/33 pad to caps 32/32/64)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepcubea_tpu.envs import get_environment
    from deepcubea_tpu.utils.validate import is_valid_solution, replay_states

    env = get_environment("cube3")
    s0, _ = env.generate_scrambles(jax.random.PRNGKey(3), 1, 25)
    s0 = np.asarray(s0)[0]
    rng = np.random.default_rng(5)
    for L in (1, 31, 32, 33):
        moves = [int(m) for m in rng.integers(0, env.num_actions, size=L)]
        cur = jnp.asarray(s0[None, :])
        seq = []
        for m in moves:
            cur = env.step(cur, jnp.asarray([m], jnp.int32))
            seq.append(np.asarray(cur)[0])
        fused = replay_states(env, s0, moves)
        assert fused.shape[0] == L
        assert all((a == b).all() for a, b in zip(seq, fused))
    # validity check consistent with replay: scramble moves reversed solve
    moves = []
    cur = jnp.asarray(s0[None, :])
    rev = env.reverse_action_map
    # walk back to goal via BFS-free trick: use the scramble's own reverse
    # (generate a fresh known path instead)
    goal = np.asarray(env.goal_states(1))[0]
    path = [int(m) for m in rng.integers(0, env.num_actions, size=17)]
    end = replay_states(env, goal, path)[-1]
    undo = [int(rev[m]) for m in reversed(path)]
    assert is_valid_solution(env, end, undo)
