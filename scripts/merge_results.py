"""Merge two results.pkl files for the same state set, keeping the better
entry per state: solved beats unsolved; among solved, fewer nodes wins
(same-length solutions from different configurations), unless the other
is shorter — length dominates.

Used r4 to combine the sokoban B=2 re-campaign (reference-level node
counts) with the r3 B=64 campaign (full coverage) if the re-campaign is
interrupted at round end.

Usage: python scripts/merge_results.py <primary.pkl> <fallback.pkl> <out.pkl>
"""
import pickle
import sys

import numpy as np


def better(a_sol, a_nodes, b_sol, b_nodes):
    """True if entry A (primary) should be kept over B."""
    if a_sol is None:
        # both unsolved: keep A untouched rather than pointlessly
        # overwriting its times/nodes with B's (ADVICE r4)
        return b_sol is None
    if b_sol is None:
        return True
    if len(a_sol) != len(b_sol):
        return len(a_sol) < len(b_sol)
    return a_nodes <= b_nodes


def main():
    pa, pb, out = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(pa, "rb") as f:
        A = pickle.load(f)
    with open(pb, "rb") as f:
        B = pickle.load(f)
    n = len(A["solutions"])
    assert len(B["solutions"]) == n
    assert np.array_equal(np.asarray(A["states"]), np.asarray(B["states"]))
    kept_a = 0
    prov = A.setdefault("time_provenance", [None] * n)
    if len(prov) < n:
        prov.extend([None] * (n - len(prov)))
    b_prov = B.get("time_provenance") or [None] * n
    for i in range(n):
        if better(A["solutions"][i], A["num_nodes_generated"][i],
                  B["solutions"][i], B["num_nodes_generated"][i]):
            kept_a += 1
            continue
        for k in ("solutions", "paths", "times", "num_nodes_generated"):
            A[k][i] = B[k][i]
        # mark the timing convention switch for clean-timing consumers
        prov[i] = b_prov[i] or "merged_fallback"
    with open(out, "wb") as f:
        pickle.dump(A, f, protocol=-1)
    solved = [s for s in A["solutions"] if s is not None]
    lens = [len(s) for s in solved]
    nodes = [nn for s, nn in zip(A["solutions"], A["num_nodes_generated"])
             if s is not None]
    print(f"merged -> {out}: kept {kept_a} primary / {n - kept_a} fallback; "
          f"{len(solved)}/{n} solved, avg len {np.mean(lens):.2f}, "
          f"avg nodes {np.mean(nodes):,.0f}")


if __name__ == "__main__":
    main()
