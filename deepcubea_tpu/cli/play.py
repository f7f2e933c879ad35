"""Interactive sokoban play mode (reference sokoban.py:247-298 is a
matplotlib key-press env; this is its terminal equivalent — WASD to move,
r for a new instance, p for 20 random moves, q to quit)."""

from __future__ import annotations

import sys
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

KEYMAP = {"w": 0, "s": 1, "a": 2, "d": 3}
GLYPHS = {"floor": "·", "wall": "#", "box": "◼", "goal": "○",
          "box_on_goal": "◉", "agent": "@", "agent_on_goal": "A"}


def render(env, state: np.ndarray) -> str:
    agent, boxes, walls, goals = (np.asarray(x)[0] for x in
                                  env.unpack(jnp.asarray(state[None])))
    dim = env.dim
    rows = []
    for r in range(dim):
        row = []
        for c in range(dim):
            i = r * dim + c
            if (agent[0], agent[1]) == (r, c):
                ch = GLYPHS["agent_on_goal"] if goals[i] else GLYPHS["agent"]
            elif walls[i]:
                ch = GLYPHS["wall"]
            elif boxes[i] and goals[i]:
                ch = GLYPHS["box_on_goal"]
            elif boxes[i]:
                ch = GLYPHS["box"]
            elif goals[i]:
                ch = GLYPHS["goal"]
            else:
                ch = GLYPHS["floor"]
            row.append(ch)
        rows.append(" ".join(row))
    return "\n".join(rows)


def main(argv=None):
    from ..envs import get_environment
    from .train import _load_sokoban_boards

    p = ArgumentParser(description=__doc__)
    p.add_argument("--sokoban_boards", type=str, default=None)
    p.add_argument("--steps", type=int, default=500,
                   help="random-walk length for new instances")
    args = p.parse_args(argv)

    env = get_environment("sokoban")
    _load_sokoban_boards(env, args.sokoban_boards)
    key = jax.random.PRNGKey(0)

    def new_instance(key):
        key, k = jax.random.split(key)
        states, _ = env.generate_scrambles(k, 1, args.steps)
        return key, np.asarray(states)[0]

    key, state = new_instance(key)
    print("w/a/s/d move, r new instance, p random moves, q quit")
    while True:
        print(render(env, state))
        if bool(np.asarray(env.is_solved(jnp.asarray(state[None])))[0]):
            print("SOLVED!")
        try:
            cmd = input("> ").strip().lower()
        except EOFError:
            return
        if cmd == "q":
            return
        if cmd == "r":
            key, state = new_instance(key)
            continue
        if cmd == "p":
            key, k = jax.random.split(key)
            acts = jax.random.randint(k, (20,), 0, 4)
            s = jnp.asarray(state[None])
            for a in np.asarray(acts):
                s = env.step(s, jnp.asarray([int(a)], jnp.int32))
            state = np.asarray(s)[0]
            continue
        for ch in cmd:
            if ch in KEYMAP:
                s = env.step(jnp.asarray(state[None]),
                             jnp.asarray([KEYMAP[ch]], jnp.int32))
                state = np.asarray(s)[0]


if __name__ == "__main__":
    main()
