"""Per-optimal-cost decomposition of the lightsout7 value function
(VERDICT r3 "what's weak" #2: the second plateau has no written root
cause).

LightsOut 7x7 over GF(2): optimal cost = weight of the minimal solution
of A x = s. For every state with optimal cost c > 0, each of the 49
moves produces a child of optimal cost c-1 (press a solution button) or
>= c-1 (otherwise). So the actionable diagnostics, per TRUE cost c:

  1. pred mean/std   — is the value function monotone in c, and does it
                       discriminate BETWEEN adjacent costs (the A* ranking
                       signal), not just track the mean?
  2. greedy accuracy — P(argmin_a h(child_a) child has cost c-1): the
                       probability one GBFS/A* step makes progress.
                       Random baseline ~= (#cost-decreasing moves)/49.
  3. margin          — mean over states of
                       min_{a: c-1} h(child_a) - min_{a: not c-1} h(child_a)
                       (negative = good: the best descending child
                       outranks every non-descending child).

Runs on CPU so in-flight TPU jobs are undisturbed.
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
from deepcubea_tpu.training.heuristic import heuristic_values
from deepcubea_tpu.models.resnet import build_model

p = argparse.ArgumentParser()
p.add_argument("--model", default="saved_models/lightsout7_r3/current")
p.add_argument("--n", type=int, default=4096)
args = p.parse_args()

env = get_environment("lightsout7")
params, stats, cfg = load_model_variables(args.model, env)
model = build_model(cfg)

# sample states across the full depth range so every cost bucket is hit
key = jax.random.PRNGKey(7)
chunks = []
for i, d in enumerate(range(2, 52, 2)):
    k = jax.random.fold_in(key, i)
    n = args.n // 25
    s, _ = env.generate_scrambles(k, n, d, depths=jnp.full((n,), d, jnp.int32))
    chunks.append(np.asarray(s))
states = np.unique(np.concatenate(chunks), axis=0)
opt = np.asarray(env.optimal_costs(states)).astype(np.int64)
print(f"{states.shape[0]} unique states, optimal cost range "
      f"[{opt.min()}, {opt.max()}], mean {opt.mean():.2f}")

h_self = np.asarray(heuristic_values(env, model, params, stats,
                                     jnp.asarray(states), clip_zero=True))

# expand all children, oracle + heuristic per child
sj = jnp.asarray(states)
children = np.asarray(env.expand(sj)[0])       # (N, A, W)
N, A, W = children.shape
child_flat = children.reshape(N * A, W)
h_child = np.asarray(heuristic_values(env, model, params, stats,
                                      jnp.asarray(child_flat),
                                      clip_zero=True)).reshape(N, A)
opt_child = np.asarray(env.optimal_costs(child_flat)).astype(
    np.int64).reshape(N, A)

desc = opt_child == (opt[:, None] - 1)          # cost-decreasing moves
greedy = np.argmin(h_child, axis=1)
greedy_desc = desc[np.arange(N), greedy]

print(f"\n{'c':>3} {'n':>5} {'pred':>6} {'std':>5} {'d(pred)':>7} "
      f"{'#desc':>5} {'grdy%':>6} {'rand%':>6} {'margin':>7}")
prev_mean = None
for c in range(0, opt.max() + 1):
    m = opt == c
    if m.sum() < 5:
        prev_mean = None
        continue
    pm, ps = h_self[m].mean(), h_self[m].std()
    nd = desc[m].sum(1).mean()
    g = 100.0 * greedy_desc[m].mean()
    r = 100.0 * nd / A
    # margin: best descending child minus best non-descending child
    hd = np.where(desc[m], h_child[m], np.inf).min(1)
    hn = np.where(~desc[m], h_child[m], np.inf).min(1)
    ok = np.isfinite(hd) & np.isfinite(hn)
    marg = (hd - hn)[ok].mean() if ok.any() else float("nan")
    dm = f"{pm - prev_mean:+.2f}" if prev_mean is not None else "     -"
    print(f"{c:>3} {m.sum():>5} {pm:>6.2f} {ps:>5.2f} {dm:>7} "
          f"{nd:>5.1f} {g:>6.1f} {r:>6.1f} {marg:>7.2f}")
    prev_mean = pm

# where does ranking break: Kendall-style pairwise accuracy between
# adjacent cost levels (P(h(state at c) < h(state at c+2)))
print("\npairwise ranking accuracy h(c) < h(c+2):")
for c in range(2, opt.max() - 1, 2):
    a, b = h_self[opt == c], h_self[opt == c + 2]
    if len(a) < 5 or len(b) < 5:
        continue
    acc = (a[:, None] < b[None, :]).mean()
    print(f"  c={c:>2} vs {c + 2:>2}: {100 * acc:5.1f}%  "
          f"(n={len(a)},{len(b)})")
