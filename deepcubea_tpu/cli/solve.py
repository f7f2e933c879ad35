"""Solver CLI — the `search_methods/astar.py` main equivalent.

Usage (mirrors reference train.sh:9):
  python -m deepcubea_tpu.cli.solve --states data/cube3/test/data_0.pkl \
      --model saved_models/cube3/current --env cube3 --weight 0.6 \
      --batch_size 10000 --results_dir results/cube3

Loads either reference-format test pickles (State objects; via the compat
unpickler) or this framework's packed-array pickles. Solves `--instances`
states per device dispatch (the reference solves strictly sequentially,
astar.py:416). Writes results.pkl {'states', 'solutions', 'paths', 'times',
'num_nodes_generated'} (astar.py:392-397) and per-state output lines in the
reference's format (astar.py:449-452).
"""

from __future__ import annotations

import os
import pickle
import time
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--states", type=str, required=True)
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--env", type=str, required=True)
    p.add_argument("--weight", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=1,
                   help="nodes popped per instance per iteration (BWAS B)")
    p.add_argument("--results_dir", type=str, required=True)
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--end_idx", type=int, default=None)
    p.add_argument("--instances", type=int, default=1,
                   help="states solved in parallel per dispatch")
    p.add_argument("--pool_capacity", type=int, default=1 << 22)
    p.add_argument("--table_capacity", type=int, default=1 << 23)
    p.add_argument("--max_iters", type=int, default=20000)
    p.add_argument("--first_goal", action="store_true", default=False,
                   help="Python-reference termination (first goal) instead "
                        "of the C++ proof rule")
    p.add_argument("--approx_pop", action="store_true", default=False)
    p.add_argument("--sort_by_h", action="store_true", default=False,
                   help="batch similar-difficulty states together (ordered "
                        "by initial heuristic); results keep input order")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="devices to shard the instance axis of the device "
                        "engine over (instances must divide by it)")
    p.add_argument("--stream", action="store_true", default=False,
                   help="replace-on-finish streaming (device engine): all "
                        "states flow through --instances persistent slots; "
                        "finished slots are re-seeded without recompiling "
                        "(kills lockstep-straggler waste; real per-state "
                        "times)")
    p.add_argument("--check_every", type=int, default=8,
                   help="search iterations fused into one device dispatch "
                        "between done-vector reads (streaming engine); "
                        "raise for small B*I configs where per-dispatch "
                        "overhead dominates, at the cost of up to this "
                        "many wasted iters per finished slot")
    p.add_argument("--max_iters_per", type=int, default=None,
                   help="per-state step budget for --stream (default: "
                        "--max_iters)")
    p.add_argument("--resume", action="store_true", default=False,
                   help="reload results_dir/results.pkl and solve only the "
                        "states it has no solution for (campaign restart "
                        "after an interruption)")
    p.add_argument("--retry_unsolved", type=float, default=0.0,
                   help="after the sweep, re-solve unsolved states alone "
                        "with max_iters scaled by this factor (0 = off)")
    p.add_argument("--eval_budget", type=float, default=1.0,
                   help="fraction of children given real NN heuristics per "
                        "step (device engine); overflow uses provisionals")
    p.add_argument("--max_path_len", type=int, default=1024)
    p.add_argument("--max_probes", type=int, default=16,
                   help="closed-table probe depth; each probe is one fused "
                        "table gather (~latency-bound), lower = faster "
                        "steps, more overflow-accepts at high load")
    p.add_argument("--int8", action="store_true", default=False,
                   help="serve the heuristic via the int8-quantized folded "
                        "net (models/quant.py): ~2x MXU throughput on the "
                        "matmuls, ~0.1-unit extra heuristic noise")
    p.add_argument("--engine", type=str, default="device",
                   choices=["device", "hybrid", "sharded"],
                   help="device: fully on-accelerator batched BWAS; "
                        "hybrid: C++ host frontier + device heuristic "
                        "(the reference's --language cpp architecture); "
                        "sharded: one frontier spread over all devices")
    p.add_argument("--nnet_batch_size", type=int, default=None,
                   help="accepted for reference-CLI parity; unused (the "
                        "heuristic evaluates in-program)")
    p.add_argument("--language", type=str, default="tpu",
                   help="accepted for reference-CLI parity; always tpu")
    p.add_argument("--verbose", action="store_true", default=False)
    for k in ("h1_dim", "resnet_dim", "num_resnet_blocks"):
        p.add_argument(f"--{k}", type=int, default=None,
                       help="nnet shape override (for non-default torch "
                            ".pt checkpoints; ours carry their config)")
    p.add_argument("--debug", action="store_true", default=False)
    return p.parse_args(argv)


def load_states(path: str, env):
    from ..utils.compat import load_test_set

    with open(path, "rb") as f:
        head = f.read(64)
    del head
    try:
        with open(path, "rb") as f:
            data = pickle.load(f)
        if isinstance(data, dict) and isinstance(data.get("states"), np.ndarray):
            return data  # our packed format
    except Exception:
        pass
    return load_test_set(path, env)


def main(argv=None):
    import jax

    from ..envs import get_environment
    from ..models import build_model
    from ..search import AStarConfig, BatchWeightedAStar
    from ..utils import is_valid_solution
    from ..utils.logger import install_logger

    from ..utils.quiesce import install_quiesce_handler
    install_quiesce_handler()
    args = parse_args(argv)
    os.makedirs(args.results_dir, exist_ok=True)
    if not args.debug:
        install_logger(os.path.join(args.results_dir, "output.txt"))

    env = get_environment(args.env)
    data = load_states(args.states, env)
    states = np.asarray(data["states"])
    end = args.end_idx if args.end_idx is not None else states.shape[0]
    states = states[args.start_idx:end]
    n = states.shape[0]

    from ._common import load_model_variables
    overrides = {k: getattr(args, k)
                 for k in ("h1_dim", "resnet_dim", "num_resnet_blocks")
                 if getattr(args, k) is not None}
    params, stats, nnet_config = load_model_variables(args.model, env,
                                                      overrides)
    model = build_model(nnet_config)
    if args.int8:
        from ..models.quant import (calibrate_activation_scales,
                                    quantize_serving)
        qp = quantize_serving(model, params, stats)
        # static activation scales: calibrate on deep scrambles so the
        # per-layer ranges cover search-time inputs (dynamic per-row
        # quantization was the reason int8 lost to bf16 end-to-end)
        cal, _ = env.generate_scrambles(jax.random.PRNGKey(7), 2048, 100)
        params, stats = calibrate_activation_scales(
            model, qp, env.encode(cal)), {}

    print(f"devices: {jax.devices()}")
    if args.engine == "hybrid":
        from ..search.host_astar import HostAStar
        host_solver = HostAStar(env, model, params, stats,
                                weight=args.weight,
                                batch_size=args.batch_size,
                                table_capacity=args.table_capacity,
                                first_goal=args.first_goal)
        solve_batch = None
    elif args.engine == "sharded":
        from ..parallel import make_mesh
        from ..search.astar_sharded import ShardedAStar, ShardedAStarConfig
        scfg = ShardedAStarConfig(
            weight=args.weight, batch_size=args.batch_size,
            pool_capacity=args.pool_capacity,
            table_capacity=args.table_capacity,
            first_goal=args.first_goal, max_path_len=args.max_path_len)
        sharded_solver = ShardedAStar(env, model, params, stats, scfg,
                                      make_mesh(model_parallel=1))
        solve_batch = None
    else:
        cfg = AStarConfig(
            weight=args.weight, batch_size=args.batch_size,
            pool_capacity=args.pool_capacity,
            table_capacity=args.table_capacity,
            first_goal=args.first_goal, approx_pop=args.approx_pop,
            max_path_len=args.max_path_len, max_probes=args.max_probes,
            eval_budget_fraction=args.eval_budget)
        mesh = None
        if args.data_parallel > 1:
            from ..parallel import make_mesh
            mesh = make_mesh(args.data_parallel, model_parallel=1)
            assert args.instances % args.data_parallel == 0, (
                "--instances must divide by --data_parallel")
        solver = BatchWeightedAStar(env, model, params, stats, cfg, mesh=mesh)
        solve_batch = solver.solve

    if solve_batch is None:
        args.instances = 1  # hybrid/sharded engines are one-instance-at-a-time

        def solve_batch(roots, max_iters, verbose):
            root = roots[0]
            if args.engine == "hybrid":
                return host_solver.solve_one(np.asarray(root),
                                             max_iters=max_iters)
            return sharded_solver.solve_one(root, max_iters=max_iters,
                                            verbose=verbose)

    # instances in one lockstep batch run until the LAST one terminates, so
    # grouping similar-difficulty states together wastes less compute on
    # finished slots; the initial heuristic value is the difficulty proxy
    order = np.arange(n)
    if args.sort_by_h and n > args.instances:
        from ..training.heuristic import heuristic_values
        h0 = np.asarray(heuristic_values(env, model, params, stats,
                                         jnp.asarray(states)))
        order = np.argsort(h0, kind="stable")

    results = dict(states=states,
                   solutions=[None] * n, paths=[None] * n,
                   times=[0.0] * n, num_nodes_generated=[0] * n)

    if args.resume:
        prev_path = os.path.join(args.results_dir, "results.pkl")
        if os.path.exists(prev_path):
            with open(prev_path, "rb") as f:
                prev = pickle.load(f)
            if (len(prev.get("solutions", [])) == n
                    and np.array_equal(np.asarray(prev["states"]), states)):
                for k in ("solutions", "paths", "times",
                          "num_nodes_generated"):
                    results[k] = list(prev[k])
                ndone = sum(s is not None for s in results["solutions"])
                print(f"resume: {ndone}/{n} already solved, skipping them")
            else:
                print("resume: existing results.pkl does not match the "
                      "state set; starting fresh")
        order = np.array([i for i in order
                          if results["solutions"][i] is None], np.int64)

    # provenance for readers (bench.py clean-timing, compare): which states
    # were assigned first (their wall times absorb the one-off XLA compile)
    # and which timing convention the `times` column uses — stream = true
    # per-state wall clock, lockstep = batch time prorated by finish_iters
    results["assign_order"] = [int(i) for i in order]
    results["engine"] = args.engine
    results["timing_mode"] = ("stream" if (args.stream and
                                           args.engine == "device")
                              else "lockstep-prorated")

    n_work = len(order)
    if args.stream and args.engine == "device" and n_work > 0:
        _solve_streaming(args, env, solver, states, order, results)
        sweep_batches = []  # stream covered everything; retries still apply
    else:
        sweep_batches = list(range(0, n_work, args.instances))

    for lo in sweep_batches:
        hi = min(lo + args.instances, n_work)
        batch_idx = order[lo:hi]
        roots_np = states[batch_idx]
        # ragged tail: pad with copies of the last root so the compiled
        # instance shape (and any data_parallel sharding contract) holds;
        # padding slots are ignored below
        pad = args.instances - (hi - lo)
        if pad > 0 and args.instances > 1:
            roots_np = np.concatenate(
                [roots_np, np.repeat(roots_np[-1:], pad, axis=0)])
        roots = jnp.asarray(roots_np)
        t0 = time.time()
        res = solve_batch(roots, max_iters=args.max_iters,
                          verbose=args.verbose)
        batch_time = time.time() - t0

        # honest per-state latency in a lockstep batch: instance j finished
        # at step finish_iters[j] of the batch's run, so it consumed that
        # fraction of the batch wall time (steps have ~constant duration)
        fi = getattr(res, "finish_iters", None)
        if fi is not None and np.max(fi[:hi - lo], initial=0) > 0:
            t_vec = batch_time * np.asarray(fi, np.float64) / max(
                float(np.max(fi)), 1.0)
        else:
            t_vec = np.full(args.instances, batch_time / max(hi - lo, 1))

        for j in range(hi - lo):
            idx = int(batch_idx[j])
            soln = res.solutions[j]
            t = float(t_vec[j])
            results["solutions"][idx] = soln
            results["times"][idx] = t
            results["num_nodes_generated"][idx] = int(res.num_generated[j])
            if soln is None:
                print(f"State: {idx}, UNSOLVED "
                      f"(pool_dropped={int(res.pool_dropped[j])})")
                continue
            assert is_valid_solution(env, states[idx], soln), idx
            path = _replay_path(env, states[idx], soln)
            results["paths"][idx] = path
            print("State: %i, SolnCost: %.2f, # Moves: %i, "
                  "# Nodes Gen: %s, Time: %.2f" % (
                      idx, float(len(soln)), len(soln),
                      format(int(res.num_generated[j]), ","), t))

        # flush after every batch so long runs survive interruption
        _dump_results(args.results_dir, results)

    if args.retry_unsolved > 0:
        retry = [i for i in range(n) if results["solutions"][i] is None]
        budget = int(args.max_iters * args.retry_unsolved)
        retry_solve = solve_batch
        if retry and args.engine == "device" and args.data_parallel > 1:
            # single-instance retries cannot satisfy the sharded solver's
            # instances-divide-by-data contract (astar.py:338); retry on a
            # dedicated unsharded solver instead
            retry_solver = BatchWeightedAStar(env, model, params, stats,
                                              cfg, mesh=None)
            retry_solve = retry_solver.solve
        for idx in retry:
            t0 = time.time()
            res = retry_solve(jnp.asarray(states[idx][None]),
                              max_iters=budget, verbose=args.verbose)
            t = time.time() - t0
            soln = res.solutions[0]
            results["times"][idx] = t
            results["num_nodes_generated"][idx] = int(res.num_generated[0])
            if soln is None:
                print(f"State: {idx}, UNSOLVED after retry "
                      f"({budget} iters)")
                continue
            assert is_valid_solution(env, states[idx], soln), idx
            results["solutions"][idx] = soln
            results["paths"][idx] = _replay_path(env, states[idx], soln)
            print("State: %i, SolnCost: %.2f, # Moves: %i, "
                  "# Nodes Gen: %s, Time: %.2f (retry)" % (
                      idx, float(len(soln)), len(soln),
                      format(int(res.num_generated[0]), ","), t))
            _dump_results(args.results_dir, results)

    out = _dump_results(args.results_dir, results)
    solved = [s for s in results["solutions"] if s is not None]
    print(f"solved {len(solved)}/{n}; results -> {out}")


def _solve_streaming(args, env, solver, states, order, results):
    """Run the whole (ordered) state set through solve_stream, printing the
    reference-format line and flushing results.pkl as each state lands."""
    from ..utils import is_valid_solution

    ordered = states[order]
    completed = [0]

    def on_result(j, soln, t, nodes, iters):
        idx = int(order[j])
        results["solutions"][idx] = soln
        results["times"][idx] = float(t)
        results["num_nodes_generated"][idx] = int(nodes)
        completed[0] += 1
        if soln is None:
            print(f"State: {idx}, UNSOLVED ({iters} iters)")
        else:
            assert is_valid_solution(env, states[idx], soln), idx
            results["paths"][idx] = _replay_path(env, states[idx], soln)
            print("State: %i, SolnCost: %.2f, # Moves: %i, "
                  "# Nodes Gen: %s, Time: %.2f" % (
                      idx, float(len(soln)), len(soln),
                      format(int(nodes), ","), t))
        if completed[0] % 25 == 0:
            _dump_results(args.results_dir, results)

    budget = args.max_iters_per or args.max_iters
    res = solver.solve_stream(
        np.asarray(ordered), instances=args.instances,
        max_iters_per=budget, check_every=args.check_every,
        verbose=args.verbose, on_result=on_result)
    # per-state `times` are assignment->completion LATENCY; with I
    # concurrent slots the chip-seconds per state (the number comparable
    # to the reference's sequential per-state times) is wall/n — record
    # what a consumer needs to compute it
    results["instances"] = args.instances
    results["stream_wall_s"] = float(res.time_s)


def _dump_results(results_dir, results):
    out = os.path.join(results_dir, "results.pkl")
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(results, f, protocol=-1)
    os.replace(tmp, out)
    return out


def _replay_path(env, state, moves):
    from ..utils.validate import replay_states

    root = np.asarray(state)
    if not moves:
        return [root]
    # single fused scan dispatch (utils/validate.py replay_states): the
    # old per-move env.step loop serialized 1-2 tunnel round-trips per
    # move and stalled the solve stream's slot refills for seconds per
    # solved state (r5 sokoban campaign finding)
    arr = replay_states(env, root, moves)
    return [root] + [arr[i] for i in range(arr.shape[0])]


if __name__ == "__main__":
    main()
