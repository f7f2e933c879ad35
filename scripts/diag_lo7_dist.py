"""Distribution-mismatch probe for the lightsout7 value function.

Hypothesis (round-4 plateau diagnosis): the net learned a proxy feature
(lit-light count / scramble statistics) instead of the GF(2) cost. Under
the training distribution depth ~ cost, lit-count ~ grows with cost, so
the proxy fits; on SEARCH-encountered states (low cost reached from a
deep start: lit-count stays deep-like) the proxy collapses to the deep
mean. Test: same optimal cost c, different provenance:

  shallow(c) — states from depth-c scrambles (training-like)
  deep(c)    — states from depth >= 30 scrambles that happen to have
               cost c (search-like)

If pred(shallow, c) tracks c while pred(deep, c) is flat ~21.7, the
plateau is a training-distribution defect, and the lever is labeling
search-encountered states (longer/weighted astar-update horizons), not
capacity or more iterations.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from deepcubea_tpu.cli._common import load_model_variables
from deepcubea_tpu.envs.registry import get_environment
from deepcubea_tpu.models.resnet import build_model
from deepcubea_tpu.training.heuristic import heuristic_values

p = argparse.ArgumentParser()
p.add_argument("--model", default="saved_models/lightsout7_r3/current")
p.add_argument("--n", type=int, default=20000)
args = p.parse_args()

env = get_environment("lightsout7")
params, stats, cfg = load_model_variables(args.model, env)
model = build_model(cfg)

key = jax.random.PRNGKey(99)


def sample(depth, n, salt):
    k = jax.random.fold_in(key, salt)
    s, _ = env.generate_scrambles(k, n, depth,
                                  depths=jnp.full((n,), depth, jnp.int32))
    return np.asarray(s)


pools = {}
# shallow pools: depth == c
for c in range(2, 22, 2):
    pools[("shallow", c)] = sample(c, args.n // 10, c)
# deep pool: depth 40, bucket by oracle afterwards
deep = np.concatenate([sample(40, args.n, 1000 + i) for i in range(3)])
deep = np.unique(deep, axis=0)
opt_deep = np.asarray(env.optimal_costs(deep)).astype(np.int64)

print(f"deep pool: {deep.shape[0]} states, cost dist: "
      + " ".join(f"{c}:{(opt_deep == c).sum()}"
                 for c in range(0, 33, 2) if (opt_deep == c).sum()))

print(f"\n{'c':>3} | {'shallow n':>9} {'pred':>6} {'lit':>5} | "
      f"{'deep n':>6} {'pred':>6} {'lit':>5}")
for c in range(2, 22, 2):
    sh = pools[("shallow", c)]
    opt_sh = np.asarray(env.optimal_costs(sh)).astype(np.int64)
    sh = sh[opt_sh == c]
    dp = deep[opt_deep == c]
    row = f"{c:>3} |"
    if len(sh) >= 5:
        h = np.asarray(heuristic_values(env, model, params, stats,
                                        jnp.asarray(sh), clip_zero=True))
        row += f" {len(sh):>9} {h.mean():>6.2f} {sh.sum(1).mean():>5.1f} |"
    else:
        row += f" {len(sh):>9} {'-':>6} {'-':>5} |"
    if len(dp) >= 5:
        h = np.asarray(heuristic_values(env, model, params, stats,
                                        jnp.asarray(dp), clip_zero=True))
        row += f" {len(dp):>6} {h.mean():>6.2f} {dp.sum(1).mean():>5.1f}"
    else:
        row += f" {len(dp):>6} {'-':>6} {'-':>5}"
    print(row)

# direct proxy check: on the deep pool, corr(pred, lit) vs corr(pred, cost)
h_deep = np.asarray(heuristic_values(env, model, params, stats,
                                     jnp.asarray(deep), clip_zero=True))
lit = deep.sum(1)
print(f"\ndeep pool correlations: corr(pred, optimal)="
      f"{np.corrcoef(h_deep, opt_deep)[0, 1]:.3f}  "
      f"corr(pred, lit_count)={np.corrcoef(h_deep, lit)[0, 1]:.3f}  "
      f"corr(lit, optimal)={np.corrcoef(lit.astype(float), opt_deep)[0, 1]:.3f}")
