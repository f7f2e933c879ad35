"""Environment/runtime micro-benchmark (tests/timing_test.py equivalent):
throughput of goal generation, scramble generation, expansion, encoding and
heuristic evaluation for one environment on the current backend."""

from __future__ import annotations

import time
from argparse import ArgumentParser

import jax
import jax.numpy as jnp


def timed(label, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt * 1000:.2f} ms")
    return out, dt


def main(argv=None):
    from ..envs import get_environment
    from ..models import build_model, init_variables
    from ..training.heuristic import heuristic_values

    p = ArgumentParser(description=__doc__)
    p.add_argument("--env", type=str, required=True)
    p.add_argument("--num_states", type=int, default=100_000)
    p.add_argument("--back_max", type=int, default=30)
    args = p.parse_args(argv)

    env = get_environment(args.env)
    n = args.num_states
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}; env {env.name}; N={n}")

    goals, _ = timed("goal_states", jax.jit(lambda: env.goal_states(n)))

    gen = jax.jit(lambda k: env.generate_scrambles(k, n, args.back_max)[0])
    states, dt = timed("generate_scrambles", gen, key)
    print(f"  -> {n / dt:,.0f} states/s")

    exp = jax.jit(lambda s: env.expand(s)[0])
    _, dt = timed("expand", exp, states)
    print(f"  -> {n * env.num_actions / dt:,.0f} children/s")

    enc = jax.jit(env.encode)
    _, dt = timed("encode", enc, states)

    model = build_model(env.nnet_config)
    params, stats = init_variables(model, key, env.encode(states[:2]))
    heur = jax.jit(lambda p, s, x: heuristic_values(env, model, p, s, x))
    _, dt = timed("heuristic_fn", heur, params, stats, states)
    print(f"  -> {n / dt:,.0f} evals/s")


if __name__ == "__main__":
    main()
