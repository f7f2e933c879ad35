"""Diagnose the lightsout7 value-function saturation (round-2 defect).

LightsOut moves commute and are self-inverse, so the optimal solution is a
subset of cells to press: A x = s over GF(2) with A the (49,49) plus-shape
toggle matrix.  For 7x7, A is invertible, so the optimal cost is exactly
popcount(A^{-1} s).  That gives a perfect oracle for the value function —
something the reference never had (its lightsout7 baseline lists optimal
as n/a).

Compares, against this oracle:
  * the reference's shipped net (saved_models/lightsout7/current/model_state_dict.pt)
  * our trained net(s)
on (a) fixed-depth scrambles and (b) the reference test set.

Run CPU-only: JAX_PLATFORMS=cpu python scripts/diag_lightsout7.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepcubea_tpu.envs.registry import get_environment
from deepcubea_tpu.models.resnet import ResnetValueNet
from deepcubea_tpu.training.heuristic import heuristic_values

REF = "/root/reference"


from deepcubea_tpu.envs.lightsout_oracle import LightsOutOracle


def optimal_costs(states, oracle):
    return oracle.optimal_costs(states)


def main():
    env = get_environment("lightsout7")
    oracle = LightsOutOracle(7)
    assert oracle.rank == 49

    # sanity: oracle vs BFS on shallow scrambles
    rng = np.random.default_rng(0)

    # fixed-depth scrambles via the env itself
    key = jax.random.PRNGKey(0)
    nets = {}

    from deepcubea_tpu.cli._common import load_model_variables
    for name, path in [
        ("reference", f"{REF}/saved_models/lightsout7/current"),
        ("ours_r2", "saved_models/lightsout7_r2/current"),
    ]:
        try:
            params, stats, cfg = load_model_variables(path, env)
        except (SystemExit, FileNotFoundError) as e:
            print(f"skip {name}: {e}")
            continue
        model = ResnetValueNet(**cfg)
        nets[name] = (model, params, stats)

    print("=== fixed-depth scrambles (512 states/depth) ===")
    print(f"{'depth':>5} {'opt_mean':>8} " +
          " ".join(f"{n + '_mean':>14} {n + '_mad':>10}" for n in nets))
    for depth in [0, 1, 2, 5, 8, 10, 12, 15, 18, 20, 25, 30, 40, 50]:
        key, k1 = jax.random.split(key)
        states, _ = env.generate_scrambles(
            k1, 512, max(depth, 1), depths=jnp.full((512,), depth, jnp.int32))
        s_np = np.asarray(states)
        opt = optimal_costs(s_np, oracle)
        row = f"{depth:>5} {opt.mean():>8.2f} "
        for n, (model, params, stats) in nets.items():
            h = np.asarray(heuristic_values(env, model, params, stats,
                                            jnp.asarray(s_np), clip_zero=True))
            row += f"{h.mean():>14.2f} {np.abs(h - opt).mean():>10.2f} "
        print(row)

    # reference test set
    from deepcubea_tpu.utils.compat import load_test_set
    test = load_test_set(f"{REF}/data/lightsout7/test/data_0.pkl", env)
    s_np = np.asarray(test["states"])[:500]
    opt = optimal_costs(s_np, oracle)
    print(f"\n=== reference test set (n={len(s_np)}) ===")
    print(f"optimal: mean {opt.mean():.2f} min {opt.min()} max {opt.max()}")
    print("(reference solved avg 24.26 — optimality rate was unknown upstream)")
    for n, (model, params, stats) in nets.items():
        h = np.asarray(heuristic_values(env, model, params, stats,
                                        jnp.asarray(s_np), clip_zero=True))
        print(f"{n}: pred mean {h.mean():.2f}  MAD vs optimal "
              f"{np.abs(h - opt).mean():.2f}  corr "
              f"{np.corrcoef(h, opt)[0, 1]:.3f}")

    # === Bellman fixed-point probe ===
    # In the stalled flat region the AVI label is 1 + min_a h_targ(child).
    # If mean(label - h(parent)) ~ 0, growth has equilibrated against the
    # min-over-49-children noise bias (E[min of A noisy siblings] ~ mu - c*sigma).
    print("\n=== Bellman growth probe (label - h(parent)) on depth-50 scrambles ===")
    key, k1 = jax.random.split(key)
    states, _ = env.generate_scrambles(
        k1, 256, 50, depths=jnp.full((256,), 50, jnp.int32))
    children, tc = env.expand(states)           # (B, A, W)
    b, a_n, w_dim = children.shape
    flat = children.reshape(b * a_n, w_dim)
    for n, (model, params, stats) in nets.items():
        for dt, dtname in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
            m = ResnetValueNet(dtype=dt, **{k: v for k, v in
                               env.nnet_config.items()})
            hp = np.asarray(heuristic_values(env, m, params, stats,
                                             states, clip_zero=True))
            hc = np.asarray(heuristic_values(env, m, params, stats,
                                             jnp.asarray(flat),
                                             clip_zero=True)).reshape(b, a_n)
            label = 1.0 + hc.min(axis=1)
            mean_label = 1.0 + hc.mean(axis=1)
            print(f"{n}/{dtname}: h(parent) {hp.mean():.3f}  "
                  f"label(min) {label.mean():.3f}  growth {np.mean(label - hp):+.3f}  "
                  f"label(mean-backup) {mean_label.mean():.3f}  "
                  f"sibling spread std {hc.std(axis=1).mean():.3f}")


if __name__ == "__main__":
    main()
