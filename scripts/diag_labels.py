"""Where does the Bellman signal die? Bin A*-explorer labels by EXACT cost.

Loads a lightsout checkpoint, runs the production astar_explore with the
checkpoint as its own target (the stalled equilibrium), and for every
labeled (popped state, label) pair computes the exact GF(2) optimal cost.
Reports, per optimal-cost bucket:
  n            how many labeled samples fall here (data coverage)
  h(parent)    the net's current prediction
  label        the Bellman label the trainer would fit
  label-h      the growth signal SGD actually sees

If label-h is ~+1 where h < optimal, labels are healthy and the stall is a
FITTING problem; if label-h ~ 0 there, the bootstrap itself has
equilibrated (min-over-children bias) and retraining with the same recipe
will stall again.

Usage: python scripts/diag_labels.py <model_dir> <env> <back_max> <steps>
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

from deepcubea_tpu.cli._common import load_model_variables
from deepcubea_tpu.envs.registry import get_environment
from deepcubea_tpu.models.resnet import ResnetValueNet
from deepcubea_tpu.training.astar_explore import astar_explore
from deepcubea_tpu.training.heuristic import heuristic_values


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lo5exp/lo5/current"
    env_name = sys.argv[2] if len(sys.argv) > 2 else "lightsout5"
    back_max = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    n_roots = int(sys.argv[5]) if len(sys.argv) > 5 else 64

    env = get_environment(env_name)
    params, stats, cfg = load_model_variables(model_dir, env)
    model = ResnetValueNet(**cfg)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    depths = jax.random.randint(k1, (n_roots,), 0, back_max + 1)
    roots, _ = env.generate_scrambles(k2, n_roots, back_max,
                                      depths=depths.astype(jnp.int32))
    weights = jax.random.uniform(k3, (n_roots,))

    res = astar_explore(env, model, params, stats, roots, weights, steps)
    xs = np.asarray(res.traj_states).reshape(-1, env.state_width)
    ys = np.asarray(res.traj_ctg).reshape(-1)
    valid = np.asarray(res.traj_valid).reshape(-1)
    xs, ys = xs[valid], ys[valid]

    h = np.asarray(heuristic_values(env, model, params, stats,
                                    jnp.asarray(xs), clip_zero=True))
    opt = np.asarray(env.optimal_costs(xs))

    print(f"{len(ys)} labeled samples from {n_roots} roots x {steps} steps "
          f"(w ~ U[0,1), depth ~ U[0,{back_max}])")
    print(f"{'opt':>4} {'n':>6} {'h(parent)':>10} {'label':>8} "
          f"{'label-h':>8} {'h-opt':>7}")
    for c in range(int(opt.max()) + 1):
        m = opt == c
        if m.sum() == 0:
            continue
        print(f"{c:>4} {m.sum():>6} {h[m].mean():>10.2f} {ys[m].mean():>8.2f} "
              f"{(ys[m] - h[m]).mean():>+8.2f} {(h[m] - c).mean():>+7.2f}")

    deep = opt >= np.percentile(opt, 75)
    print(f"\ndeep quartile (opt >= {np.percentile(opt, 75):.0f}): "
          f"n {deep.sum()}, mean growth {(ys[deep] - h[deep]).mean():+.3f}, "
          f"mean deficit (opt-h) {(opt[deep] - h[deep]).mean():+.3f}")


if __name__ == "__main__":
    main()
