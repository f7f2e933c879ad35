"""Trend the per-update GBFS depth-bucket eval stats from metrics.jsonl.

VERDICT r2 ("what's weak" #2): puzzle35's loss plateau was invisible until
solve time because nothing trended the eval stats the trainer already logs.
This reads <save_dir>/<name>/metrics.jsonl, prints per_solved for a spread
of scramble-depth buckets across target updates, and flags a stall when the
deep-band solve rate has not improved over the trailing window.

Usage:  python scripts/trend_gbfs.py saved_models/puzzle35 [--window 5]

Pure host-side (no JAX); safe to run while the trainer holds the chip.
"""

import argparse
import ast
import json
import os
import sys


def load_evals(metrics_path):
    rows = []
    with open(metrics_path) as f:
        for line in f:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = d.get("eval")
            if ev is None:
                continue
            if isinstance(ev, str):
                ev = ast.literal_eval(ev)
            rows.append((int(d["itr"]), int(d["update_num"]),
                         {int(k): v for k, v in ev.items()}))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", help="e.g. saved_models/puzzle35")
    p.add_argument("--window", type=int, default=5,
                   help="stall = no deep-band improvement over this many evals")
    p.add_argument("--buckets", type=int, default=6,
                   help="number of depth buckets to display (evenly spread)")
    args = p.parse_args(argv)

    path = os.path.join(args.run_dir, "metrics.jsonl")
    rows = load_evals(path)
    if not rows:
        print(f"no eval records in {path}")
        return 1

    depths = sorted(rows[-1][2].keys())
    show = [depths[round(i * (len(depths) - 1) / (args.buckets - 1))]
            for i in range(args.buckets)]
    show = sorted(set(show))
    # deep band = top third of the depth range (where stalls bite first)
    deep = [d for d in depths if d >= depths[-1] * 2 // 3]

    hdr = "itr      upd  " + "".join(f"d{d:<6}" for d in show) + "deep-band"
    print(hdr)
    for itr, upd, ev in rows:
        cells = "".join(f"{ev[d]['per_solved']:5.1f}  " if d in ev else "  --   "
                        for d in show)
        db = [ev[d]["per_solved"] for d in deep if d in ev]
        db_mean = sum(db) / len(db) if db else float("nan")
        print(f"{itr:<8} {upd:<4} {cells}{db_mean:8.2f}")

    deep_series = []
    for _, _, ev in rows:
        db = [ev[d]["per_solved"] for d in deep if d in ev]
        if db:
            deep_series.append(sum(db) / len(db))
    if len(deep_series) > args.window:
        recent = deep_series[-args.window:]
        best_before = max(deep_series[:-args.window])
        delta = max(recent) - best_before
        stalled = delta <= 0.5  # <0.5pp gain over the window
        print(f"\ndeep-band ({deep[0]}..{deep[-1]} back-steps) solve rate: "
              f"best-before-window {best_before:.2f}%, "
              f"window-max {max(recent):.2f}%, delta {delta:+.2f}pp "
              f"-> {'STALLED' if stalled else 'improving'}")
        return 2 if stalled else 0
    print("\n(not enough evals for a stall verdict)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
