"""Merge a (possibly partial) residue sub-run back into its campaign.

resolve_residue.py merges only after its cli.solve call returns, i.e.
after ALL residue states finish. A round cutoff mid-run would strand the
already-solved improvements in <results_dir>/residue_<tag>/results.pkl.
This tool applies the same keep-strictly-better merge (plus
time_provenance stamping) from whatever the sub-run has flushed so far;
safe to run repeatedly — merging is idempotent and monotone.

Usage:
  python scripts/merge_residue_partial.py --results_dir results/puzzle35 \
      --tag r5q [--max_nodes 0]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", required=True)
    p.add_argument("--tag", required=True)
    p.add_argument("--max_nodes", type=int, default=0,
                   help="node-economy mode: equal-length at fewer nodes "
                        "also merges (resolve_residue --max_nodes)")
    args = p.parse_args(argv)

    sub_dir = os.path.join(args.results_dir, f"residue_{args.tag}")
    with open(os.path.join(sub_dir, "indices.pkl"), "rb") as f:
        idxs = pickle.load(f)
    with open(os.path.join(sub_dir, "results.pkl"), "rb") as f:
        sub = pickle.load(f)
    res_path = os.path.join(args.results_dir, "results.pkl")
    with open(res_path, "rb") as f:
        results = pickle.load(f)
    n = len(results["solutions"])

    prov = results.setdefault("time_provenance", [None] * n)
    if len(prov) < n:
        prov.extend([None] * (n - len(prov)))
    improved = 0
    done = sum(1 for s in sub["solutions"] if s is not None)
    for j, i in enumerate(idxs):
        if j >= len(sub["solutions"]):
            break
        new = sub["solutions"][j]
        old = results["solutions"][i]
        better = new is not None and (old is None or len(new) < len(old))
        if (not better and args.max_nodes and new is not None
                and old is not None and len(new) == len(old)):
            better = (sub["num_nodes_generated"][j]
                      < results["num_nodes_generated"][i])
        if better:
            results["solutions"][i] = new
            results["paths"][i] = sub["paths"][j]
            results["times"][i] = sub["times"][j]
            results["num_nodes_generated"][i] = sub["num_nodes_generated"][j]
            prov[i] = f"residue_{args.tag}"
            improved += 1
    tmp = res_path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(results, f, protocol=-1)
    os.replace(tmp, res_path)
    solved = [s for s in results["solutions"] if s is not None]
    lens = [len(s) for s in solved]
    nn = np.array([results["num_nodes_generated"][i] for i in range(n)
                   if results["solutions"][i] is not None], dtype=float)
    print(f"partial merge: sub-run {done}/{len(idxs)} solved, "
          f"{improved} improved; campaign {len(solved)}/{n}, "
          f"avg len {np.mean(lens):.3f}, mean nodes {nn.mean():,.0f}")


if __name__ == "__main__":
    main()
