"""Greedy best-first search evaluation CLI.

Equivalent of the reference's `python search_methods/gbfs.py`
(gbfs.py:184-211; broken upstream — it calls gbfs_test with the wrong
arity at gbfs.py:211). Two modes:

  - `--states <dir-or-pkl>`: greedy-solve states loaded from pickled shards
    (reference data_utils.py:26-49 format, or this framework's packed
    arrays) for `--max_steps` steps; prints %solved and average solve steps.
  - no `--states`: generate fresh scrambles and print the per-depth-bucket
    table of `gbfs_test` (reference gbfs.py:127-181).
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, required=True,
                   help="checkpoint dir (ours or reference .pt)")
    p.add_argument("--env", type=str, required=True)
    p.add_argument("--states", type=str, default=None,
                   help="pickle file or directory of data_*.pkl shards; "
                        "omit to evaluate on fresh scrambles")
    p.add_argument("--max_steps", type=int, default=None,
                   help="GBFS step budget (default: back_max)")
    p.add_argument("--num_states", type=int, default=1000)
    p.add_argument("--back_max", type=int, default=30)
    p.add_argument("--eps_max", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    from ..envs import get_environment
    from ..models import build_model
    from ..training.gbfs import gbfs_run, gbfs_test
    from ..training.heuristic import heuristic_values
    from ._common import load_model_variables

    args = parse_args(argv)
    env = get_environment(args.env)
    params, stats, nnet_config = load_model_variables(args.model, env)
    model = build_model(nnet_config)
    print(f"devices: {jax.devices()}")

    key = jax.random.PRNGKey(args.seed)
    max_steps = args.max_steps or args.back_max

    if args.states is None:
        gbfs_test(env, model, params, stats, args.num_states, args.back_max,
                  key, max_solve_steps=args.max_steps)
        return

    if os.path.isdir(args.states):
        from ..utils.compat import load_states_from_files
        states = load_states_from_files(args.states, env)
    else:
        from ..utils.compat import load_test_set
        states = load_test_set(args.states, env)["states"]

    n = states.shape[0]
    k_eps, k_run = jax.random.split(key)
    eps = jax.random.uniform(k_eps, (n,)) * args.eps_max
    res = gbfs_run(env, model, params, stats, jnp.asarray(states), eps,
                   k_run, int(max_steps), record_trajs=False)
    ctg = np.asarray(heuristic_values(env, model, params, stats,
                                      jnp.asarray(states)))
    solved = np.asarray(res.is_solved)
    steps = np.asarray(res.num_steps)
    print(f"Solved {n} states with GBFS ({max_steps} steps): "
          f"%solved: {100.0 * solved.mean():.2f}, "
          f"avgSolveSteps: {steps[solved].mean() if solved.any() else 0.0:.2f}, "
          f"CTG Mean(Std/Min/Max): {ctg.mean():.2f}"
          f"({ctg.std():.2f}/{ctg.min():.2f}/{ctg.max():.2f})")


if __name__ == "__main__":
    main()
