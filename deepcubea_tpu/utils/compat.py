"""Readers for the reference's pickled artifacts.

The reference ships test sets as pickles of
{'states': [State objects], 'solutions': [move lists], ...}
(data/<env>/test/data_0.pkl, loaded at astar.py:375-376) where the State
classes are environments.cube3.Cube3State etc. with numpy-array slots
(cube3.py:10-24, n_puzzle.py:10-24, lights_out.py:9-23, sokoban.py:15-43).
This module unpickles them WITHOUT importing the reference (or torch):
a custom Unpickler maps the class names onto slot-compatible shims, then
states convert to this framework's packed (N, W) uint8 arrays.
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Dict, List, Optional

import numpy as np

from ..envs.base import Environment
from ..envs.sokoban import Sokoban


class _StateShim:
    """Accepts any pickled attribute/slot state."""

    def __setstate__(self, state):
        if isinstance(state, tuple):  # (__dict__, __slots__ dict)
            for part in state:
                if part:
                    self.__dict__.update(part)
        elif isinstance(state, dict):
            self.__dict__.update(state)


class Cube3State(_StateShim):
    pass


class NPuzzleState(_StateShim):
    pass


class LightsOutState(_StateShim):
    pass


class SokobanState(_StateShim):
    pass


_CLASS_MAP = {
    ("environments.cube3", "Cube3State"): Cube3State,
    ("environments.n_puzzle", "NPuzzleState"): NPuzzleState,
    ("environments.lights_out", "LOState"): LightsOutState,
    ("environments.sokoban", "SokobanState"): SokobanState,
}


class RefUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):
        if (module, name) in _CLASS_MAP:
            return _CLASS_MAP[(module, name)]
        # numpy internals moved in numpy 2.x; old pickles reference np.core
        if module.startswith("numpy.core"):
            module = module.replace("numpy.core", "numpy._core")
        return super().find_class(module, name)


def load_reference_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return RefUnpickler(f).load()


def states_to_array(states: List[Any], env: Environment) -> np.ndarray:
    """Shimmed reference State objects -> packed (N, W) array."""
    first = states[0]
    if hasattr(first, "colors"):
        return np.stack([np.asarray(s.colors) for s in states]).astype(env.dtype)
    if hasattr(first, "tiles"):
        return np.stack([np.asarray(s.tiles) for s in states]).astype(env.dtype)
    if hasattr(first, "boxes"):
        assert isinstance(env, Sokoban)
        n = len(states)
        agent = np.stack([np.asarray(s.agent) for s in states]).astype(np.uint8)
        boxes = np.stack([np.asarray(s.boxes).reshape(-1) for s in states])
        walls = np.stack([np.asarray(s.walls).reshape(-1) for s in states])
        goals = np.stack([np.asarray(s.goals).reshape(-1) for s in states])
        return np.concatenate(
            [agent, boxes.astype(np.uint8), walls.astype(np.uint8),
             goals.astype(np.uint8)], axis=1)
    raise ValueError(f"unrecognized reference state type: {type(first)}")


_CUBE_FACES = {"U": 0, "D": 1, "L": 2, "R": 3, "B": 4, "F": 5}
_PUZZLE_MOVES = {"U": 0, "D": 1, "L": 2, "R": 3}


def normalize_solution(moves: List[Any]) -> List[int]:
    """Reference solution encodings -> this framework's action indices.

    cube3 test pickles store [face, sign] pairs (e.g. ['D', -1]); our move
    ordering is 2*face + (sign == 1) matching cube3.py:28. n-puzzle pickles
    store 'U'/'D'/'L'/'R' strings (n_puzzle.py:28). Integer actions pass
    through unchanged.
    """
    out: List[int] = []
    for m in moves:
        if isinstance(m, (int, np.integer)):
            out.append(int(m))
        elif isinstance(m, str):
            out.append(_PUZZLE_MOVES[m.upper()])
        elif isinstance(m, (list, tuple)) and len(m) == 2:
            face, sign = m
            out.append(2 * _CUBE_FACES[str(face).upper()] + (int(sign) == 1))
        else:
            raise ValueError(f"unrecognized move encoding: {m!r}")
    return out


def load_states_from_files(data_dir: str, env: Environment,
                           max_files: int = 0) -> np.ndarray:
    """Concatenate states from every data_*.pkl shard in a directory
    (reference utils/data_utils.py:26-49), accepting both this framework's
    packed-array shards and reference-format object shards."""
    import glob
    import os

    paths = sorted(glob.glob(os.path.join(data_dir, "data_*.pkl")))
    if max_files:
        paths = paths[:max_files]
    chunks = []
    for p in paths:
        data = load_reference_pickle(p)
        s = data["states"] if isinstance(data, dict) else data
        if not isinstance(s, np.ndarray):
            s = states_to_array(s, env)
        chunks.append(np.asarray(s))
    if not chunks:
        raise FileNotFoundError(f"no data_*.pkl shards in {data_dir}")
    return np.concatenate(chunks, axis=0)


def load_test_set(path: str, env: Environment) -> Dict[str, Any]:
    """Returns {'states': (N, W) uint8, 'solutions': Optional[List[List[int]]],
    plus any other keys verbatim}."""
    data = load_reference_pickle(path)
    out = dict(data)
    out["states"] = states_to_array(data["states"], env)
    if out.get("solutions"):
        out["solutions"] = [None if s is None else normalize_solution(s)
                            for s in out["solutions"]]
    return out
