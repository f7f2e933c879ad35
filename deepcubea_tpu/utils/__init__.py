from .validate import bfs_distances, is_valid_solution

__all__ = ["bfs_distances", "is_valid_solution"]
