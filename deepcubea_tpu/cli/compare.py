"""Solution-quality comparison CLI (scripts/compare_solutions.py:7-56):
min/max/median/mean(std) of times, lengths, nodes generated and nodes/s for
two results pickles, plus the solution-length-difference histogram and the
%-equal-to-optimal rate."""

from __future__ import annotations

import pickle
from argparse import ArgumentParser
from collections import Counter

import numpy as np


def _load(path):
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        from ..utils.compat import load_reference_pickle
        return load_reference_pickle(path)


def print_stats(name, vals):
    vals = np.asarray(vals, dtype=np.float64)
    print("%s - min/max/median/mean(std): %.2f/%.2f/%.2f/%.2f(%.2f)" % (
        name, vals.min(), vals.max(), float(np.median(vals)), vals.mean(),
        vals.std()))


def print_results(tag, data, idxs):
    lens = np.array([len(data["solutions"][i]) for i in idxs])
    print(f"-- {tag} --")
    if data.get("times") is not None:
        times = np.array([data["times"][i] for i in idxs], dtype=np.float64)
        print_stats("Times", times)
    else:
        times = None
    print_stats("Lengths", lens)
    if data.get("num_nodes_generated"):
        nodes = np.array([data["num_nodes_generated"][i] for i in idxs],
                         dtype=np.float64)
        print_stats("Nodes generated", nodes)
        if times is not None and (times > 0).all():
            print_stats("Nodes/sec", nodes / times)
    return lens


def main(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--soln1", type=str, required=True,
                   help="baseline results pickle (e.g. shortest-path test set)")
    p.add_argument("--soln2", type=str, required=True,
                   help="results pickle to evaluate")
    args = p.parse_args(argv)

    d1, d2 = _load(args.soln1), _load(args.soln2)
    idxs = [i for i in range(min(len(d1["solutions"]), len(d2["solutions"])))
            if d1["solutions"][i] is not None and d2["solutions"][i] is not None]
    print(f"comparing {len(idxs)} commonly-solved states")

    lens1 = print_results("soln1", d1, idxs)
    lens2 = print_results("soln2", d2, idxs)

    diff = lens2 - lens1
    hist = Counter(diff.tolist())
    print("Solution length difference (soln2 - soln1) histogram:")
    for k in sorted(hist):
        print(f"  {k:+d}: {hist[k]}")
    print("%% equal to soln1 length: %.2f%%" % (100.0 * (diff == 0).mean()))
    return diff


if __name__ == "__main__":
    main()
