"""Localize the gap between kernel-bench throughput (cube3 B=10k: ~1.35M
nodes/s) and production solve throughput (puzzle15 slice: ~45k nodes/s
marginal, bench.py --domain).

Measures jitted A* step time across a config sweep, solo on the chip
(pause_background_jobs), separating:
  - env/net (cube3 vs puzzle15)
  - instances (1 vs 2)
  - pool/table capacity (bench 4M/8M vs production 8M/16M)
  - dispatch pattern (free-running async vs blocking sync every 8 steps,
    the solve_stream cadence)

Usage: python scripts/profile_solve_step.py [--iters 16]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from deepcubea_tpu.utils.bench_pause import pause_background_jobs  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(env_name, batch, instances, pool, table, iters, sync_every=None,
            eval_budget=1.0, max_probes=6, approx_pop=True, label="",
            env=None):
    from deepcubea_tpu.envs import get_environment
    from deepcubea_tpu.models import build_model, init_variables
    from deepcubea_tpu.search import AStarConfig, astar_init, make_astar_step

    if env is None:
        env = get_environment(env_name)
    model = build_model(env.nnet_config)
    cfg = AStarConfig(weight=0.8, batch_size=batch, pool_capacity=pool,
                      table_capacity=table, approx_pop=approx_pop,
                      max_probes=max_probes, eval_budget_fraction=eval_budget)
    roots, _ = env.generate_scrambles(
        jax.random.PRNGKey(1), instances, 1000,
        depths=jnp.full((instances,), 1000, jnp.int32))
    # init from scrambles, not goal_states: sokoban's goals are
    # per-instance hindsight relabels and goal_states() raises
    params, stats = init_variables(model, jax.random.PRNGKey(0),
                                   env.encode(roots[:2]))
    state = astar_init(env, cfg, roots)
    step = make_astar_step(env, model, cfg)

    t0 = time.time()
    state = step(state, params, stats)
    jax.block_until_ready(state.f)
    compile_s = time.time() - t0
    for _ in range(2):
        state = step(state, params, stats)
    jax.block_until_ready(state.f)

    t0 = time.time()
    if sync_every == "fused":
        # one fori_loop dispatch over all iters: measures pure device
        # rate, immune to per-dispatch overhead AND to the axon layer's
        # in-flight dedup of byte-identical donated-buffer dispatches
        # (the r4 bench hazard, bench.py measure()). Compare against the
        # per-step rows to read the dispatch overhead directly.
        macro = jax.jit(lambda s: jax.lax.fori_loop(
            0, iters, lambda _, x: step(x, params, stats), s),
            donate_argnums=(0,))
        state = macro(state)
        jax.block_until_ready(state.f)
        t0 = time.time()  # timed second macro, compile excluded
        state = macro(state)
        jax.block_until_ready(state.f)
    elif sync_every:
        k = 0
        for _ in range(iters):
            state = step(state, params, stats)
            k += 1
            if k % sync_every == 0:
                _ = np.asarray(state.done)  # solve_stream cadence
        jax.block_until_ready(state.f)
    else:
        for _ in range(iters):
            state = step(state, params, stats)
        jax.block_until_ready(state.f)
    dt = (time.time() - t0) / iters
    nodes_s = batch * env.num_actions * instances / dt
    tag = label or (
        f"{env_name} B={batch} I={instances} pool=2^{pool.bit_length()-1} "
        f"tbl=2^{table.bit_length()-1} "
        f"sync={sync_every if isinstance(sync_every, str) else ('every' + str(sync_every) if sync_every else 'free')}")
    print(f"{tag}: {dt*1000:8.1f} ms/step  {nodes_s:12,.0f} nodes/s  "
          f"(compile {compile_s:.0f}s)", flush=True)


def sweep_configs(iters):
    """Original kernel-vs-production sweep (r3 campaign-gap diagnosis)."""
    M = 1 << 20
    measure("cube3", 10_000, 1, 4 * M, 8 * M, iters)
    measure("puzzle15", 20_000, 2, 8 * M, 16 * M, iters)
    measure("puzzle15", 20_000, 2, 8 * M, 16 * M, iters, sync_every=8)
    measure("puzzle15", 20_000, 1, 8 * M, 16 * M, iters)
    measure("puzzle15", 20_000, 1, 4 * M, 8 * M, iters)
    measure("puzzle15", 10_000, 1, 4 * M, 8 * M, iters)
    measure("cube3", 10_000, 2, 8 * M, 16 * M, iters)


def sweep_breakdown(iters):
    """Bisect the cube3 B=10k step (~79 ms) into components via config
    knobs: NN share (eval_budget->0), probe share (max_probes 1 vs 6),
    pop share (exact top_k vs approx), table-size share (1M vs 8M)."""
    M = 1 << 20
    base = dict(env_name="cube3", batch=10_000, instances=1,
                pool=4 * M, table=8 * M, iters=iters)
    measure(**base, label="full step (baseline)")
    measure(**base, eval_budget=1e-6, label="no NN   (eval_budget~0)")
    measure(**base, max_probes=1, label="1 probe  (vs 6)")
    measure(**base, eval_budget=1e-6, max_probes=1,
            label="no NN + 1 probe")
    measure(**base, approx_pop=False, label="exact top_k pop")
    measure("cube3", 10_000, 1, 4 * M, 1 * M, iters,
            label="small table (1M vs 8M)")
    measure(**base, eval_budget=0.5, label="NN on 50% of children")


def sweep_sokoban(iters):
    """Round-5 (VERDICT r4 weak #1): the B=2 x I=16 production step ran
    150-200 ms where ~10-20 ms of device work is expected. Separate
    per-dispatch overhead (per-step vs fused rows) from true device time,
    at the campaign config and a few scaled ones."""
    import pickle
    from deepcubea_tpu.envs import get_environment, load_boards_from_grid
    env = get_environment("sokoban")
    boards = pickle.load(
        open("/root/reference/data/sokoban/data_0.pkl", "rb"))
    env.set_boards(load_boards_from_grid(boards))
    K = 1 << 10
    for sync in ("fused", None, 8):
        measure("sokoban", 2, 16, 128 * K, 256 * K, iters, sync_every=sync,
                env=env)
    measure("sokoban", 16, 8, 512 * K, 1024 * K, iters, sync_every="fused",
            env=env)
    measure("sokoban", 2, 64, 128 * K, 256 * K, iters, sync_every="fused",
            env=env)


def sweep_iaxis(iters):
    """Round-4: why does I=2 cost 3.3x an I=1 step (not 2x)? Bisect the
    instance-axis penalty into NN / table-probe / pop shares."""
    M = 1 << 20
    for inst in (1, 2, 4):
        base = dict(env_name="cube3", batch=10_000, instances=inst,
                    pool=4 * M, table=8 * M, iters=iters)
        measure(**base, label=f"I={inst} full")
        measure(**base, eval_budget=1e-6, label=f"I={inst} no NN")
        measure(**base, eval_budget=1e-6, max_probes=1,
                label=f"I={inst} no NN, 1 probe")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--mode",
                   choices=["configs", "breakdown", "iaxis", "sokoban"],
                   default="configs")
    args = p.parse_args()
    log(f"devices: {jax.devices()}")
    with pause_background_jobs():
        if args.mode == "breakdown":
            sweep_breakdown(args.iters)
        elif args.mode == "iaxis":
            sweep_iaxis(args.iters)
        elif args.mode == "sokoban":
            sweep_sokoban(args.iters)
        else:
            sweep_configs(args.iters)


if __name__ == "__main__":
    main()

