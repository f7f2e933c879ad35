"""Localize the lightsout7 value-function stall (VERDICT round 2, item 1).

Three questions, answered with the GF(2) exact oracle
(envs/lightsout_oracle.py):

  1. What does the REFERENCE's own shipped net
     (/root/reference/saved_models/lightsout7/current/model_state_dict.pt)
     predict on deep scrambles vs the oracle?  If it is also flat/biased,
     our net has reached reference quality and the defect is in the solve
     configuration, not training.
  2. Does our net's prediction change materially between the bf16 forward
     (production labeling dtype) and an f32 forward?  Quantifies the
     bf16 min-over-49-children label bias hypothesis.
  3. Per-depth (one-step Bellman label - oracle) decomposition for our
     target net: where does the backup chain stop tracking the oracle?

Runs on CPU (JAX_PLATFORMS=cpu) so in-flight TPU jobs are undisturbed.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from deepcubea_tpu.cli._common import load_model_variables
from deepcubea_tpu.envs.registry import get_environment
from deepcubea_tpu.models.resnet import build_model, forward_eval
from deepcubea_tpu.training.gbfs import bellman_backup

env = get_environment("lightsout7")
DEPTHS = [5, 10, 15, 20, 25, 30, 40, 50]
N = 512

nets = {}
for name, path in [
    ("reference", "/root/reference/saved_models/lightsout7/current"),
    ("r3_target", "saved_models/lightsout7_r3/target"),
    ("r3_current", "saved_models/lightsout7_r3/current"),
]:
    try:
        params, stats, cfg = load_model_variables(path, env)
        nets[name] = (params, stats, cfg)
        print(f"loaded {name} from {path}")
    except (Exception, SystemExit) as e:  # noqa: BLE001
        print(f"SKIP {name}: {e}")

probes = {}
for d in DEPTHS:
    states, _ = env.generate_scrambles(
        jax.random.PRNGKey(1000 + d), N, d,
        depths=jnp.full((N,), d, jnp.int32))
    states = np.asarray(states)
    opt = np.asarray(env.optimal_costs(states)).astype(np.float64)
    probes[d] = (states, opt)

print("\n=== prediction vs oracle, per depth (bf16 and f32 forward) ===")
hdr = f"{'net':>10} {'dtype':>5} " + " ".join(f"d={d:<2}" + " " * 10 for d in DEPTHS)
print(f"{'':>17} per-depth: mean_pred/mean_opt corr")
for name, (params, stats, cfg) in nets.items():
    for dtype, tag in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        model = build_model(cfg, dtype=dtype)
        fwd = jax.jit(lambda s, p=params, st=stats, m=model: jnp.maximum(
            forward_eval(m, p, st, env.encode(s)), 0.0))
        cells = []
        for d in DEPTHS:
            states, opt = probes[d]
            h = np.asarray(fwd(jnp.asarray(states))).astype(np.float64)
            corr = np.corrcoef(h, opt)[0, 1] if opt.std() > 0 else 0.0
            cells.append(f"d{d}: {h.mean():5.2f}/{opt.mean():5.2f} c={corr:.2f}")
        print(f"{name:>10} {tag:>5} " + " | ".join(cells))

print("\n=== one-step Bellman label bias (bf16 target fwd vs f32), r3_target ===")
if "r3_target" in nets:
    params, stats, cfg = nets["r3_target"]
    for dtype, tag in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        model = build_model(cfg, dtype=dtype)
        bb = jax.jit(lambda s, p=params, st=stats, m=model: bellman_backup(
            env, m, p, st, s, clip_zero=True)[0])
        cells = []
        for d in DEPTHS:
            states, opt = probes[d]
            y = np.asarray(bb(jnp.asarray(states))).astype(np.float64)
            cells.append(f"d{d}: label {y.mean():5.2f} (opt {opt.mean():5.2f})")
        print(f"{tag:>5} " + " | ".join(cells))

    # direct per-state delta between the two label dtypes
    model16 = build_model(cfg, dtype=jnp.bfloat16)
    model32 = build_model(cfg, dtype=jnp.float32)
    states, opt = probes[50]
    y16 = np.asarray(jax.jit(lambda s: bellman_backup(
        env, model16, params, stats, s, clip_zero=True)[0])(jnp.asarray(states)))
    y32 = np.asarray(jax.jit(lambda s: bellman_backup(
        env, model32, params, stats, s, clip_zero=True)[0])(jnp.asarray(states)))
    delta = (y16 - y32).astype(np.float64)
    print(f"\nlabel(bf16) - label(f32) at depth 50: mean {delta.mean():+.4f}, "
          f"std {delta.std():.4f}, min {delta.min():+.4f}, max {delta.max():+.4f}")
