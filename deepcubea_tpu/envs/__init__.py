from .base import Environment, fingerprint, fingerprint_constants
from .cube3 import Cube3, Cube4
from .lightsout import LightsOut
from .npuzzle import NPuzzle
from .registry import get_environment
from .sokoban import Sokoban, load_boards_from_grid

__all__ = [
    "Environment", "fingerprint", "fingerprint_constants",
    "Cube3", "Cube4", "LightsOut", "NPuzzle", "Sokoban",
    "get_environment", "load_boards_from_grid",
]
