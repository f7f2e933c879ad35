"""Can the value net FIT lightsout at all? Supervised control experiment.

Trains the ResnetValueNet directly on exact GF(2) optimal costs (no
bootstrap, no exploration), then reports held-out correlation on deep
scrambles. Splits the lightsout stall diagnosis:
  supervised corr high  -> architecture fine; AVI dynamics are the problem
  supervised corr low   -> representation/optimization ceiling; the AVI
                           recipe is irrelevant until the net can fit

Usage: python scripts/diag_supervised.py [env] [iters] [h1] [res] [blocks]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("DCA_DIAG_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from deepcubea_tpu.envs.registry import get_environment
from deepcubea_tpu.models.resnet import (ResnetValueNet, forward_train,
                                         init_variables)
from deepcubea_tpu.training.heuristic import heuristic_values


def main():
    env_name = sys.argv[1] if len(sys.argv) > 1 else "lightsout5"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    h1 = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    res = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    blocks = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    batch = 256

    env = get_environment(env_name)
    cfg = dict(env.nnet_config)
    cfg.update(h1_dim=h1, resnet_dim=res, num_resnet_blocks=blocks)
    model = ResnetValueNet(**cfg)

    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    ex, _ = env.generate_scrambles(k_init, 8, 5)
    params, stats = init_variables(model, k_init, env.encode(ex))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt, xs, y):
        def loss_fn(p):
            out, new_stats = forward_train(model, p, stats, env.encode(xs))
            return jnp.mean((out - y) ** 2), new_stats
        (loss, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), new_stats, opt, loss

    # held-out probe: deep scrambles only
    key, kp = jax.random.split(key)
    probe, _ = env.generate_scrambles(kp, 2048, 30)
    probe_np = np.asarray(probe)
    probe_opt = np.asarray(env.optimal_costs(probe_np)).astype(np.float64)

    gen = jax.jit(lambda k: env.generate_scrambles(k, batch, 30)[0])
    for i in range(iters):
        key, kb = jax.random.split(key)
        xs = gen(kb)
        y = jnp.asarray(env.optimal_costs(np.asarray(xs)), jnp.float32)
        params, stats, opt, loss = step(params, stats, opt, xs, y)
        if i % 500 == 0 or i == iters - 1:
            h = np.asarray(heuristic_values(env, model, params, stats,
                                            probe, clip_zero=True))
            corr = np.corrcoef(h, probe_opt)[0, 1]
            mad = np.abs(h - probe_opt).mean()
            print(f"iter {i:6d} loss {float(loss):7.4f} probe corr "
                  f"{corr:+.3f} MAD {mad:.3f} pred {h.mean():.2f} "
                  f"opt {probe_opt.mean():.2f}", flush=True)


if __name__ == "__main__":
    main()
