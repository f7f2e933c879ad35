"""String -> environment factory (reference utils/env_utils.py:6-28)."""

from __future__ import annotations

import math
import re

from .base import Environment
from .cube3 import Cube3, Cube4
from .lightsout import LightsOut
from .npuzzle import NPuzzle
from .sokoban import Sokoban


def get_environment(env_name: str) -> Environment:
    env_name = env_name.lower()
    m_puzzle = re.fullmatch(r"puzzle(\d+)", env_name)
    m_lightsout = re.fullmatch(r"lightsout(\d+)(gf2)?", env_name)

    if env_name == "cube3":
        return Cube3()
    if env_name == "cube4":
        return Cube4()
    if m_puzzle:
        n_tiles = int(m_puzzle.group(1))
        dim = int(math.sqrt(n_tiles + 1))
        if dim * dim != n_tiles + 1:
            raise ValueError(f"puzzle{n_tiles}: {n_tiles}+1 is not a square")
        return NPuzzle(dim)
    if m_lightsout:
        return LightsOut(int(m_lightsout.group(1)),
                         gf2_features=m_lightsout.group(2) is not None)
    if env_name == "sokoban":
        return Sokoban(10, 4)
    raise ValueError(f"unknown environment: {env_name}")
