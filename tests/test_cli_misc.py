"""Coverage for the timing micro-benchmark CLI and the sokoban play-mode
renderer (reference tests/timing_test.py and sokoban.py:247-298)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_timing_cli_runs(capsys):
    from deepcubea_tpu.cli import timing

    timing.main(["--env", "lightsout3", "--num_states", "256",
                 "--back_max", "3"])
    out = capsys.readouterr().out
    for label in ("goal", "scramble", "expand", "encode", "heuristic"):
        assert label in out.lower(), out


def test_play_render_glyphs():
    from deepcubea_tpu.cli.play import render
    from deepcubea_tpu.envs import Sokoban
    from deepcubea_tpu.envs.sokoban import load_boards_from_grid

    env = Sokoban(dim=5, num_boxes=1)
    # 5x5: walls border, agent (1,1), box (2,2), goal (3,3)
    grid = np.zeros((1, 5, 5), np.uint8)
    grid[0, 0, :] = 4; grid[0, -1, :] = 4; grid[0, :, 0] = 4; grid[0, :, -1] = 4
    grid[0, 1, 1] = 1; grid[0, 2, 2] = 2; grid[0, 3, 3] = 3
    env.set_boards(load_boards_from_grid(grid))
    b = env._boards
    state = np.asarray(env.pack(b["agent"][:1], b["boxes"][:1],
                                b["walls"][:1], b["goals"][:1]))[0]
    art = render(env, state)
    assert "@" in art and "◼" in art and "○" in art and "#" in art
