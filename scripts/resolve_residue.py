"""Re-solve a campaign's residue states at a different configuration and
merge back, keeping the better result per state (VERDICT r3 next-steps #4
and #8: cube3's unsolved 118, puzzle15/24's non-optimal tails).

Selection:
  --unsolved            states with no solution in results.pkl
  --nonopt              states whose solution is longer than the optimal
                        length from the reference test pickle's
                        `solutions` field (puzzle15/24/cube3 carry these)
  (both can be given; union)

The subset is solved into <results_dir>/residue_<tag>/ with the given
solve flags, then merged into results.pkl ONLY where the new solution is
strictly better (solved-vs-unsolved, then shorter length). Times and
node counts follow whichever solution is kept, so campaign aggregates
stay honest.

Example:
  python scripts/resolve_residue.py --env puzzle15 \
      --results_dir results/puzzle15 \
      --states /root/reference/data/puzzle15/test/data_0.pkl \
      --model saved_models/puzzle15/current --nonopt \
      --weight 0.95 --batch_size 20000 --max_iters 2000 \
      --pool_capacity 16777216 --table_capacity 33554432
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
    p.add_argument("--env", required=True)
    p.add_argument("--results_dir", required=True)
    p.add_argument("--states", required=True,
                   help="reference test pickle (for states + optimal lens)")
    p.add_argument("--model", required=True)
    p.add_argument("--unsolved", action="store_true")
    p.add_argument("--nonopt", action="store_true")
    p.add_argument("--ref_output", type=str, default=None,
                   help="reference results output.txt: re-solve states whose "
                        "solution is longer than the reference's (domains "
                        "without optimal lengths in the test pickle)")
    p.add_argument("--min_excess", type=int, default=1,
                   help="with --ref_output: only states at least this many "
                        "moves over the reference")
    p.add_argument("--tag", default="r4")
    p.add_argument("--weight", type=float, default=0.9)
    p.add_argument("--batch_size", type=int, default=20000)
    p.add_argument("--instances", type=int, default=2)
    p.add_argument("--max_iters", type=int, default=2000)
    p.add_argument("--pool_capacity", type=int, default=1 << 24)
    p.add_argument("--table_capacity", type=int, default=1 << 25)
    p.add_argument("--max_probes", type=int, default=6)
    p.add_argument("--approx_pop", action="store_true",
                   help="approx top-k pop; OFF by default here — residue "
                        "passes are quality passes, and approx pop "
                        "inflates the proof-rule bound (premature "
                        "termination, +2..+8 moves observed on puzzle35)")
    p.add_argument("--limit", type=int, default=0,
                   help="cap the number of residue states (0 = all)")
    p.add_argument("--max_nodes", type=int, default=0,
                   help="also select solved states whose recorded node "
                        "count exceeds this (node-economy passes, e.g. "
                        "sokoban's legacy B=64 entries); merged when the "
                        "re-solve is shorter OR equal-length with fewer "
                        "nodes")
    p.add_argument("--check_every", type=int, default=8,
                   help="fused iterations per device dispatch "
                        "(cli.solve --check_every)")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args(argv)

    from deepcubea_tpu.cli import solve as solve_cli
    from deepcubea_tpu.envs import get_environment
    from deepcubea_tpu.utils.compat import load_test_set

    env = get_environment(args.env)
    data = load_test_set(args.states, env)
    states = np.asarray(data["states"])
    opt_lens = None
    if data.get("solutions") is not None:
        try:
            opt_lens = [len(s) for s in data["solutions"]]
        except TypeError:
            opt_lens = None

    res_path = os.path.join(args.results_dir, "results.pkl")
    with open(res_path, "rb") as f:
        results = pickle.load(f)
    n = len(results["solutions"])
    assert states.shape[0] == n, (states.shape, n)

    ref_lens = None
    if args.ref_output:
        import re
        ref_lens = {}
        with open(args.ref_output) as f:
            for line in f:
                m = re.search(r"State: (\d+), SolnCost: ([\d.]+)", line)
                if m:
                    ref_lens[int(m.group(1))] = int(float(m.group(2)))

    idxs = []
    for i in range(n):
        sol = results["solutions"][i]
        if args.unsolved and sol is None:
            idxs.append(i)
        elif (args.nonopt and sol is not None and opt_lens is not None
              and len(sol) > opt_lens[i]):
            idxs.append(i)
        elif (ref_lens is not None and sol is not None and i in ref_lens
              and len(sol) >= ref_lens[i] + args.min_excess):
            idxs.append(i)
        elif (args.max_nodes and sol is not None
              and results["num_nodes_generated"][i] > args.max_nodes):
            idxs.append(i)
    # worst-first: order by excess over the reference/optimal length so a
    # time-bounded pass recovers the most moves (r5 p35 quality pass)
    def excess(i):
        sol = results["solutions"][i]
        if sol is None:
            return 1 << 30
        if opt_lens is not None:
            return len(sol) - opt_lens[i]
        if ref_lens is not None and i in ref_lens:
            return len(sol) - ref_lens[i]
        return results["num_nodes_generated"][i]
    idxs.sort(key=excess, reverse=True)
    if args.limit:
        idxs = idxs[:args.limit]
    print(f"residue: {len(idxs)} states -> {idxs[:40]}{'...' if len(idxs) > 40 else ''}")
    if not idxs or args.dry_run:
        return

    sub_dir = os.path.join(args.results_dir, f"residue_{args.tag}")
    os.makedirs(sub_dir, exist_ok=True)
    sub_states = os.path.join(sub_dir, "states.pkl")
    with open(sub_states, "wb") as f:
        pickle.dump({"states": states[idxs]}, f, protocol=-1)
    with open(os.path.join(sub_dir, "indices.pkl"), "wb") as f:
        pickle.dump(idxs, f)

    argv2 = ["--states", sub_states, "--model", args.model,
             "--env", args.env, "--weight", str(args.weight),
             "--batch_size", str(args.batch_size),
             "--instances", str(min(args.instances, len(idxs))),
             "--pool_capacity", str(args.pool_capacity),
             "--table_capacity", str(args.table_capacity),
             "--max_probes", str(args.max_probes),
             *(["--approx_pop"] if args.approx_pop else []),
             "--stream", "--max_iters", str(args.max_iters),
             "--check_every", str(args.check_every),
             "--results_dir", sub_dir, "--resume"]
    print("cli.solve", " ".join(argv2))
    solve_cli.main(argv2)

    with open(os.path.join(sub_dir, "results.pkl"), "rb") as f:
        sub = pickle.load(f)

    improved = 0
    # Replaced entries carry the residue sub-run's time, which for the
    # first `instances` assigned states absorbs that run's XLA compile,
    # and in any case was measured under a different config than the
    # campaign's. Stamp per-state provenance so clean-timing consumers
    # can exclude these entries instead of silently mixing conventions
    # (ADVICE r4).
    prov = results.setdefault("time_provenance", [None] * n)
    if len(prov) < n:
        prov.extend([None] * (n - len(prov)))
    for j, i in enumerate(idxs):
        new = sub["solutions"][j]
        old = results["solutions"][i]
        better = new is not None and (old is None or len(new) < len(old))
        if (not better and args.max_nodes and new is not None
                and old is not None and len(new) == len(old)):
            # node-economy pass: same length at fewer nodes also merges
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
    print(f"merged: {improved}/{len(idxs)} improved; campaign now "
          f"{len(solved)}/{n} solved, avg len {np.mean(lens):.3f}")


if __name__ == "__main__":
    main()
