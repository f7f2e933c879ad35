"""Instrument the PRODUCTION sokoban solve path per-chunk.

The isolated jitted step measures 2.7 ms (B=2 x I=16 fused,
profile_solve_step --mode sokoban) yet the bench slice runs ~24.6 s/state
wall/n with the fleet paused — a ~300x gap that is therefore inside
solve_stream's real path, not the step kernel. Time every _steps chunk
and every reset/extract on the exact cli.solve construction.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from deepcubea_tpu.envs import get_environment
from deepcubea_tpu.models import build_model
from deepcubea_tpu.search import AStarConfig, BatchWeightedAStar
from deepcubea_tpu.cli._common import load_model_variables
from deepcubea_tpu.cli.solve import load_states
from deepcubea_tpu.utils.bench_pause import pause_background_jobs


def main():
    n_states = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    instances = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    check_every = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    env = get_environment("sokoban")
    data = load_states("/root/reference/data/sokoban/test/data_0.pkl", env)
    states = np.asarray(data["states"])[:n_states]
    params, stats, nnet_config = load_model_variables(
        "saved_models/sokoban/current", env, {})
    model = build_model(nnet_config)
    cfg = AStarConfig(weight=0.8, batch_size=2, pool_capacity=1 << 17,
                      table_capacity=1 << 18, approx_pop=True, max_probes=6)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)

    orig_steps = solver._steps
    chunk_times = []

    def timed_steps(state, k):
        t0 = time.time()
        state = orig_steps(state, k)
        jax.block_until_ready(state.f)
        chunk_times.append(time.time() - t0)
        return state

    solver._steps = timed_steps

    with pause_background_jobs():
        t0 = time.time()
        res = solver.solve_stream(states, instances=instances,
                                  max_iters_per=8192,
                                  check_every=check_every, log=print)
        wall = time.time() - t0
    ct = np.array(chunk_times)
    print(f"states={n_states} I={instances} k={check_every}: wall {wall:.1f}s, "
          f"{len(ct)} chunks, chunk mean {ct.mean()*1000:.0f}ms "
          f"median {np.median(ct)*1000:.0f}ms p90 {np.percentile(ct,90)*1000:.0f}ms "
          f"max {ct.max()*1000:.0f}ms first {ct[0]*1000:.0f}ms")
    print("chunk times (ms):", [int(x * 1000) for x in ct[:40]])
    solved = sum(1 for s in res.solutions if s is not None)
    print(f"solved {solved}/{n_states}; iters {res.search_iters}; "
          f"per-iter from chunks: {ct[1:].sum()/max((len(ct)-1)*check_every,1)*1000:.2f}ms")


if __name__ == "__main__":
    main()
