"""Headline benchmark: cube3 batch-weighted A* node-generation throughput.

Reference baseline (BASELINE.md): the C+++GPU BWAS generates ~108k nodes/s
(results/cube3/output.txt: 8.19M nodes / 75.6 s per state at weight 0.6,
batch 10k). Here the full search iteration — top-k pop, expansion, NN
heuristic, hash dedup, push — runs as one jitted device program; this
measures steady-state generated-nodes/s on one chip with the production
configuration (B=10k, full-size cube3 ResNet, random weights: throughput
does not depend on heuristic quality, termination is disabled by depth).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import contextlib
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_NODES_PER_S = 108_000.0

PIDFILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "logs", "tpu_jobs.pids")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@contextlib.contextmanager
def pause_background_jobs():
    """SIGSTOP this repo's own background TPU jobs for the measurement.

    Training/solve campaigns run continuously on the single chip; the bench
    measures hardware capability, not time-slice share, so our own jobs
    (exact PIDs recorded at launch in logs/tpu_jobs.pids, verified to be
    python processes working in this repo) are paused and always resumed —
    including on crash — via finally + a last-resort atexit hook.
    """
    pids = []
    try:
        with open(PIDFILE) as f:
            cands = [int(x) for x in f.read().split()]
    except (OSError, ValueError):
        cands = []
    me = os.getpid()
    for p in cands:
        try:
            if p == me or not os.path.exists(f"/proc/{p}"):
                continue
            if os.readlink(f"/proc/{p}/cwd") != "/root/repo":
                continue
            os.kill(p, signal.SIGSTOP)
            pids.append(p)
        except OSError:
            continue
    if pids:
        log(f"paused background jobs for measurement: {pids}")
        import atexit

        def resume():
            for p in pids:
                try:
                    os.kill(p, signal.SIGCONT)
                except OSError:
                    pass
        atexit.register(resume)
        time.sleep(5)  # let already-enqueued device programs drain
    try:
        yield
    finally:
        for p in pids:
            try:
                os.kill(p, signal.SIGCONT)
            except OSError:
                pass
        if pids:
            log("resumed background jobs")


def main():
    with pause_background_jobs():
        _main()


def _main():
    from deepcubea_tpu.envs import Cube3
    from deepcubea_tpu.models import build_model, init_variables
    from deepcubea_tpu.search import AStarConfig, astar_init, make_astar_step

    log(f"devices: {jax.devices()}")
    env = Cube3()
    model = build_model(env.nnet_config)
    params, stats = init_variables(model, jax.random.PRNGKey(0),
                                   env.encode(env.goal_states(2)))
    # production serving config: int8-quantized folded net (cli.solve --int8;
    # quality-validated in tests/test_quant.py e2e equal-length solves)
    from deepcubea_tpu.models.quant import quantize_serving
    params, stats = quantize_serving(model, params, stats), {}

    # approx top-k pop (recall 0.95): weighted A* is robust to mild pop-order
    # perturbation; solution quality is tracked separately by cli.solve +
    # cli.compare against the optimal test sets
    # max_probes 6 is the production solve configuration (each probe is one
    # latency-bound fused table gather; ~1.6% overflow-accepts at 50% load)
    cfg = AStarConfig(weight=0.6, batch_size=10_000,
                      pool_capacity=1 << 22, table_capacity=1 << 23,
                      approx_pop=True, max_probes=6)
    roots, _ = env.generate_scrambles(
        jax.random.PRNGKey(1), 1, 30,
        depths=jnp.full((1,), 26, jnp.int32))
    state = astar_init(env, cfg, roots)
    step = make_astar_step(env, model, cfg)

    # warmup / compile
    t0 = time.time()
    state = step(state, params, stats)
    jax.block_until_ready(state.f)
    log(f"compile+first step: {time.time() - t0:.1f}s")
    for _ in range(2):
        state = step(state, params, stats)
    jax.block_until_ready(state.f)

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        state = step(state, params, stats)
    jax.block_until_ready(state.f)
    dt = time.time() - t0

    nodes = iters * cfg.batch_size * env.num_actions
    nodes_per_s = nodes / dt
    log(f"{iters} iters in {dt:.2f}s; pool size "
        f"{int(np.asarray(state.size)[0]):,}; "
        f"tbl_overflow {int(np.asarray(state.tbl_overflow)[0])}")

    print(json.dumps({
        "metric": "cube3 BWAS node generation throughput (B=10k, w=0.6, 1 chip)",
        "value": round(nodes_per_s),
        "unit": "nodes/s",
        "vs_baseline": round(nodes_per_s / BASELINE_NODES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
