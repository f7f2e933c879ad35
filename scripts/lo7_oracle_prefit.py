"""lightsout7 fallback intervention (docs/LIGHTSOUT_DEBUG.md round-5
kill-criterion): supervised fine-tune of the CURRENT AVI checkpoint on
exact GF(2)-oracle optimal costs, saved as a new checkpoint dir that
cli.train / cli.solve can resume from.

Only runs if the identical-recipe bet loses (probe < 7/8 at update
~2100). The oracle (envs/lightsout_oracle.py) gives exact optimal costs
for arbitrary states — a capability the reference lacks — so labels are
unlimited and exact; the AVI resume afterwards restores search-consistent
(Bellman-consistent) calibration around the supervised init.

Usage:
  python scripts/lo7_oracle_prefit.py \
      --src saved_models/lightsout7_r3/current \
      --dst saved_models/lightsout7_sup/current \
      [--iters 20000] [--batch 1000] [--back_max 50] [--lr 1e-4]

Labels are computed on HOST (GF(2) solve, numpy) while the device trains
the previous batch — the oracle is ~us/state, never the bottleneck.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepcubea_tpu.envs.registry import get_environment
from deepcubea_tpu.models import build_model
from deepcubea_tpu.models.resnet import forward_train
from deepcubea_tpu.training.heuristic import heuristic_values
from deepcubea_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--iters", type=int, default=20000)
    p.add_argument("--batch", type=int, default=1000)
    p.add_argument("--back_max", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--log_every", type=int, default=500)
    args = p.parse_args()

    env = get_environment("lightsout7")
    ckpt = load_checkpoint(args.src)
    assert ckpt is not None, args.src
    meta = ckpt["meta"]
    model = build_model(meta["nnet_config"])
    params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
    stats = jax.tree_util.tree_map(jnp.asarray, ckpt["batch_stats"])

    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt, xs, y):
        def loss_fn(pp):
            out, new_stats = forward_train(model, pp, stats, env.encode(xs))
            return jnp.mean((out - y) ** 2), new_stats
        (loss, new_stats), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), new_stats, opt, loss

    # Training distribution: half scrambles (uniform depth 1..back_max,
    # covers the shallow band search actually traverses) + half UNIFORM
    # RANDOM boards. For lightsout a uniform board is the deepest natural
    # distribution — its optimal costs concentrate exactly in the c>=18
    # band where the AVI net's ranking decayed to chance
    # (docs/LIGHTSOUT_DEBUG.md finding 1) and where the campaign states
    # live (reference avg 24.26). A first prefit attempt on scrambles
    # alone UNDERSHOT the deep band (pred 17.8 vs opt 21.6 at 8k iters).
    half = args.batch // 2

    @jax.jit
    def gen(k):
        k1, k2 = jax.random.split(k)
        sc = env.generate_scrambles(k1, args.batch - half,
                                    args.back_max)[0]
        uni = jax.random.bernoulli(
            k2, 0.5, (half,) + sc.shape[1:]).astype(sc.dtype)
        return jnp.concatenate([sc, uni], axis=0)

    # fixed deep probe for the gate metric (same key as the trainer's
    # oracle eval so curves line up across logs)
    probe, _ = env.generate_scrambles(
        jax.random.PRNGKey(0xD1A6), 512,
        args.back_max, depths=jnp.full((512,), args.back_max, jnp.int32))
    probe_opt = np.asarray(env.optimal_costs(np.asarray(probe)))

    key = jax.random.PRNGKey(17)
    t0 = time.time()
    for i in range(args.iters):
        key, kb = jax.random.split(key)
        xs = gen(kb)
        y = jnp.asarray(env.optimal_costs(np.asarray(xs)), jnp.float32)
        params, stats, opt, loss = step(params, stats, opt, xs, y)
        if i % args.log_every == 0 or i == args.iters - 1:
            h = np.asarray(heuristic_values(env, model, params, stats,
                                            probe, clip_zero=True))
            m = probe_opt >= 0
            corr = (np.corrcoef(h[m], probe_opt[m])[0, 1]
                    if m.sum() > 1 else 0.0)
            print(f"iter {i:6d} loss {float(loss):8.4f} "
                  f"probe corr {corr:+.3f} "
                  f"MAD {np.abs(h[m]-probe_opt[m]).mean():.3f} "
                  f"pred {h[m].mean():.2f} opt {probe_opt[m].mean():.2f} "
                  f"({(i+1)/(time.time()-t0):.0f} it/s)", flush=True)

    meta = dict(meta)
    meta["supervised_prefit"] = {"iters": args.iters, "lr": args.lr,
                                 "back_max": args.back_max,
                                 "src": args.src}
    save_checkpoint(args.dst, params, stats, meta)
    # also mirror into a target/ sibling so AVI resume starts with a
    # consistent (non-stale) target net
    tgt = os.path.join(os.path.dirname(args.dst.rstrip("/")), "target")
    save_checkpoint(tgt, params, stats, meta)
    print(f"saved -> {args.dst} (+ {tgt})")


if __name__ == "__main__":
    main()
