from .avi import AVIConfig, AVITrainer, TrainState, make_train_chunk
from .gbfs import GBFSResult, bellman_backup, gbfs_run, gbfs_test
from .heuristic import heuristic_values, make_host_heuristic

__all__ = [
    "AVIConfig", "AVITrainer", "TrainState", "make_train_chunk",
    "GBFSResult", "bellman_backup", "gbfs_run", "gbfs_test",
    "heuristic_values", "make_host_heuristic",
]
