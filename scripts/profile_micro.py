"""Micro-profile the non-NN pieces of the A* step (cube3 B=10k shapes):
approx_max_k pop over the 4M-row pool, env.expand, fingerprint, ht_insert
at 1..6 probes, ht_lookup, and the block-write pattern. Complements
profile_solve_step.py --mode breakdown (which bisects the fused step).

Every rep CHAINS on the previous output: axon deduplicates identical
in-flight dispatches, so un-chained repeat-timing measures one execution
(docs/NEXT.md item 7).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from deepcubea_tpu.utils.bench_pause import pause_background_jobs  # noqa: E402


def timed_chain(label, fn, init, reps=20):
    """fn: state -> state (jitted). Chains reps so axon can't dedupe."""
    state = jax.block_until_ready(fn(init))   # compile
    t0 = time.time()
    for _ in range(reps):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.time() - t0) / reps * 1000
    print(f"{label:42s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from deepcubea_tpu.envs import Cube3
    from deepcubea_tpu.envs.base import fingerprint
    from deepcubea_tpu.search.astar import _fp_consts
    from deepcubea_tpu.search.hashtable import ht_insert, ht_lookup, ht_new

    env = Cube3()
    B, A, C, T = 10_000, env.num_actions, 1 << 22, 1 << 23
    key = jax.random.PRNGKey(0)
    consts = _fp_consts(env)

    # ~9 separate kernels compile through the tunnel: give the pause
    # watchdog room beyond its 1200s default
    with pause_background_jobs(watchdog_s=3600.0):
        print(f"devices: {jax.devices()}  B={B} A={A} pool={C} tbl={T}",
              flush=True)

        f0 = jax.random.uniform(key, (1, C), jnp.float32)

        @jax.jit
        def pop_approx(f):
            v, i = jax.lax.approx_max_k(-f, B, recall_target=0.95)
            return f + v[0, 0] * 1e-9  # chain
        timed_chain("approx_max_k (1,4M)->10k", pop_approx, f0)

        @jax.jit
        def pop_exact(f):
            v, i = jax.lax.top_k(-f, B)
            return f + v[0, 0] * 1e-9
        timed_chain("exact top_k  (1,4M)->10k", pop_exact, f0)

        states0, _ = env.generate_scrambles(key, B, 30)

        @jax.jit
        def exp_chain(s):
            ch, _ = env.expand(s)
            return ch[:, 0, :]  # first child, same shape as input
        timed_chain("expand 10k -> 120k children", exp_chain, states0)

        children = jax.jit(lambda s: env.expand(s)[0])(states0)
        children = children.reshape(B * A, env.state_width)

        @jax.jit
        def fp_chain(s):
            a, b = fingerprint(s, consts)
            return s ^ (a[:, None] & 1).astype(jnp.uint8)
        timed_chain("fingerprint 120k", fp_chain, children)

        fp0, fp1 = jax.jit(lambda s: fingerprint(s, consts))(children)
        g = jnp.zeros((B * A,), jnp.int32)
        valid = jnp.ones((B * A,), bool)

        for p in (1, 2, 6):
            @functools.partial(jax.jit, donate_argnums=(0,),
                               static_argnames=("mp",))
            def ins_chain(tbl, a, b, g_, v, mp=p):
                t2, acc, ovf = ht_insert(tbl, a, b, g_, v, mp)
                return t2
            tbl = ht_new(T)
            timed_chain(f"ht_insert 120k x {p} probes",
                        lambda t: ins_chain(t, fp0, fp1, g, valid), tbl)

        tbl = ht_new(T)
        tbl = jax.jit(lambda t: ht_insert(t, fp0, fp1, g, valid, 6)[0])(tbl)

        @jax.jit
        def look_chain(carry):
            t, a = carry
            out = ht_lookup(t, a, fp1, 6)
            return (t, a + (out[0] & 1).astype(jnp.uint32))
        timed_chain("ht_lookup 120k x 6 probes", look_chain, (tbl, fp0))

        pool0 = jnp.zeros((C, env.state_width), jnp.uint8)
        offs = jnp.cumsum(valid.astype(jnp.int32)) - 1

        @jax.jit
        def bw_chain(p):
            buf = jnp.zeros((B * A, children.shape[1]), p.dtype)
            buf = buf.at[offs].set(children ^ p[0, 0], mode="drop")
            return jax.lax.dynamic_update_slice(
                p, buf, (p[1, 0].astype(jnp.int32) & 1023, jnp.int32(0)))
        timed_chain("block write 120k rows -> pool", bw_chain, pool0)


if __name__ == "__main__":
    main()
