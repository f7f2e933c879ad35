"""Offline scrambled-state shard writer (scripts/generate_dataset.py:12-87).

The reference fans filenames out to worker processes that each run the host
scramble loop; here one device program generates each shard (millions of
states/s), so the worker pool disappears. Shards are pickles of
{'states': (N, W) uint8 array, 'num_back_steps': list} — array-format
states rather than per-state Python objects.
"""

from __future__ import annotations

import os
import pickle
from argparse import ArgumentParser

import jax
import numpy as np


def main(argv=None):
    from ..envs import get_environment

    p = ArgumentParser(description=__doc__)
    p.add_argument("--env", type=str, required=True)
    p.add_argument("--back_max", type=int, required=True)
    p.add_argument("--num_per_file", type=int, default=10000)
    p.add_argument("--num_files", type=int, default=1)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    env = get_environment(args.env)
    os.makedirs(args.save_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    for i in range(args.num_files):
        key, k = jax.random.split(key)
        states, depths = env.generate_scrambles(k, args.num_per_file,
                                                args.back_max)
        out = os.path.join(args.save_dir, f"data_{i}.pkl")
        with open(out, "wb") as f:
            pickle.dump({"states": np.asarray(states),
                         "num_back_steps": np.asarray(depths).tolist()},
                        f, protocol=-1)
        print(f"wrote {out}: {args.num_per_file} states, "
              f"depth<= {args.back_max}")


if __name__ == "__main__":
    main()
