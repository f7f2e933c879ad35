"""deepcubea_tpu — a TPU-native deep-RL + heuristic-search framework.

A from-scratch JAX/XLA re-design of the capabilities of DeepCubeA
(reference: forestagostinelli/DeepCubeA): Deep Approximate Value Iteration
(DAVI) training of cost-to-go value networks for goal-reaching puzzle
domains, and batched weighted A* / greedy best-first search guided by the
learned heuristic — all device-resident, batched, and sharded over
`jax.sharding.Mesh` device meshes.

Layers (bottom to top), mirroring the reference layer map (SURVEY.md §1):
  envs/      vectorized puzzle dynamics (permutation-gather / XOR / masked
             scatter kernels) — replaces BOTH the reference's Python envs
             (environments/*.py) and its C++ envs (cpp/environments.cpp)
  models/    the ResNet value network (utils/pytorch_models.py equivalent)
  training/  device scramble generation + AVI learner + GBFS
             (ctg_approx/avi.py + updaters/updater.py + utils/nnet_utils.py)
  search/    device-resident batched weighted A*
             (search_methods/astar.py + cpp/parallel_weighted_astar.cpp)
  parallel/  mesh/sharding utilities (replaces DataParallel + mp queues)
  utils/     logging, misc, reference-artifact compatibility readers
  cli/       train / solve / compare / generate_dataset / timing commands
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: every CLI/bench process reuses compiled
# executables across invocations (opt out: DCA_NO_CACHE=1). See
# utils/xla_cache.py for rationale and the round-1 329 s compile measurement.
from .utils.xla_cache import enable_compilation_cache as _enable_cache

_enable_cache()
del _enable_cache
