from .astar import (AStarConfig, BatchWeightedAStar, SearchState, SolveResult,
                    astar_init, make_astar_step, make_path_extractor)
from .hashtable import HashTable, ht_insert, ht_lookup, ht_new

__all__ = [
    "AStarConfig", "BatchWeightedAStar", "SearchState", "SolveResult",
    "astar_init", "make_astar_step", "make_path_extractor",
    "HashTable", "ht_insert", "ht_lookup", "ht_new",
]
