"""int8 serving path for the frozen value net (search-time heuristic).

The solve-time heuristic net is frozen, so eval-mode BatchNorm is a pure
affine map and folds into the preceding Dense; the folded net is then
quantized to int8 weights (per-output-column scales). Activations:

- the FIRST matmul's inputs are exactly binary for every domain (one-hot
  sticker/tile colors, lightsout bits, sokoban planes — cube3.py:77-85,
  sokoban.py:129-141 upstream), so int8 casting is exact there;
- inner layers use dynamic per-row quantization (scale = rowmax/127).

int8 matmuls run the MXU at 2x bf16 throughput on v5e-class chips and
halve weight/activation HBM traffic, measured ~1.26x on this net's
matmul mix (docs/NEXT.md item 5). The quantized tree is a drop-in
`params` replacement: `training.heuristic.heuristic_values` detects the
`__int8_serving__` marker and dispatches here, so every search engine
(device/sharded/hybrid) picks it up unchanged.

Deliberately NOT used for AVI target labeling: the Bellman label is a min
over `num_actions` sibling heuristics, and quantization noise feeds the
min's downward bias — the exact mechanism behind the round-2 lightsout7
value stall (see training/astar_explore.py docstring). Search only ranks
nodes by w*g+h, where ~0.1-unit noise is immaterial.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .resnet import ResnetValueNet

MARKER = "__int8_serving__"


def _fold(dense: Dict, bn_params: Dict | None, bn_stats: Dict | None,
          eps: float = 1e-5) -> Tuple[np.ndarray, np.ndarray]:
    """Fold eval-mode BN (y = scale*(x-mean)/sqrt(var+eps)+bias) into the
    preceding Dense; returns (kernel, bias) float32."""
    w = np.asarray(dense["kernel"], np.float32)
    b = np.asarray(dense["bias"], np.float32)
    if bn_params is None:
        return w, b
    k = np.asarray(bn_params["scale"], np.float32) / np.sqrt(
        np.asarray(bn_stats["var"], np.float32) + eps)
    w = w * k[None, :]
    b = (b - np.asarray(bn_stats["mean"], np.float32)) * k + np.asarray(
        bn_params["bias"], np.float32)
    return w, b


def _quant_w(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-column symmetric int8; returns (w_q int8, w_scale f32)."""
    s = np.abs(w).max(axis=0) / 127.0
    s = np.where(s == 0, 1.0, s).astype(np.float32)
    q = np.clip(np.round(w / s[None, :]), -127, 127).astype(np.int8)
    return q, s


def layer_order(model: ResnetValueNet) -> List[Tuple[str, str | None]]:
    """(dense_name, bn_name|None) in forward order (resnet.py:57-79)."""
    bn = model.batch_norm
    layers = [("fc1", "bn1" if bn else None),
              ("fc2", "bn2" if bn else None)]
    for i in range(model.num_resnet_blocks):
        layers.append((f"block{i}_fc1", f"block{i}_bn1" if bn else None))
        layers.append((f"block{i}_fc2", f"block{i}_bn2" if bn else None))
    layers.append(("fc_out", None))
    return layers


def quantize_serving(model: ResnetValueNet, params: Dict,
                     batch_stats: Dict) -> Dict:
    """(params, batch_stats) -> int8 serving tree (drop-in `params`; pass
    batch_stats={} alongside)."""
    out: Dict = {MARKER: jnp.ones((), jnp.int8)}
    for dense_name, bn_name in layer_order(model):
        w, b = _fold(params[dense_name],
                     params.get(bn_name) if bn_name else None,
                     batch_stats.get(bn_name) if bn_name else None)
        wq, ws = _quant_w(w)
        out[dense_name] = dict(wq=jnp.asarray(wq), ws=jnp.asarray(ws),
                               bias=jnp.asarray(b))
    return out


def is_quantized(params) -> bool:
    return isinstance(params, dict) and MARKER in params


def calibrate_activation_scales(model: ResnetValueNet, qparams: Dict,
                                sample_x: jnp.ndarray,
                                margin: float = 1.25) -> Dict:
    """Replace dynamic per-row activation quantization with STATIC
    per-layer scales calibrated on a sample of encoded states.

    Why: the dynamic path's per-row abs-max is a full reduction over each
    activation tensor — at search batch sizes (120k x 1000 f32) that is an
    extra ~1 GB of HBM traffic per inner layer that XLA cannot fuse into
    the matmul epilogue, and it is the whole reason int8 serving measured
    SLOWER end-to-end than bf16 (1.87M vs 2.21M nodes/s, BENCH_r04) while
    the int8 matmul itself runs 2x. With a static scale the quantize is
    elementwise (mul+round+clip+cast), fuses into the preceding
    relu/add, and the activation round-trip disappears.

    Calibration: run the folded int8 forward on `sample_x`, record each
    inner layer's max |activation|, multiply by `margin` (clipping a
    0.1%-tail of outliers costs ~nothing for rank-only serving). Returns a
    NEW qparams tree with an "as_" scalar per inner layer; quant_forward
    dispatches on its presence."""
    record: Dict[str, float] = {}

    def probe_dense(name, x):
        a = float(jnp.max(jnp.abs(x)))
        record[name] = max(record.get(name, 0.0), a)
        return _qdense(x, qparams[name])

    x = sample_x
    if model.one_hot_depth > 0:
        x = jax.nn.one_hot(x.astype(jnp.int32), model.one_hot_depth,
                           dtype=jnp.int8)
        x = x.reshape(x.shape[0], model.state_dim * model.one_hot_depth)
    x = jax.nn.relu(_qdense_binary(x, qparams["fc1"]))
    x = jax.nn.relu(probe_dense("fc2", x))
    for b in range(model.num_resnet_blocks):
        res = x
        x = jax.nn.relu(probe_dense(f"block{b}_fc1", x))
        x = probe_dense(f"block{b}_fc2", x)
        x = jax.nn.relu(x + res)
    probe_dense("fc_out", x)

    out = dict(qparams)
    for name, amax in record.items():
        layer = dict(qparams[name])
        layer["as_"] = jnp.asarray(
            max(amax * margin, 1e-12) / 127.0, jnp.float32)
        out[name] = layer
    return out


def _qdense_binary(x_bits: jnp.ndarray, layer: Dict) -> jnp.ndarray:
    """First layer: x is exactly {0,1}; int8 cast is lossless."""
    acc = jax.lax.dot_general(
        x_bits.astype(jnp.int8), layer["wq"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * layer["ws"][None, :] + layer["bias"]


def _qdense(x: jnp.ndarray, layer: Dict) -> jnp.ndarray:
    """Inner layers. With a calibrated static scale ("as_", see
    calibrate_activation_scales) the quantize is elementwise and fuses
    into the preceding op; otherwise fall back to dynamic per-row
    symmetric quantization (an unfused full-tensor reduction —
    correct, but measured slower end-to-end than bf16)."""
    a_s = layer.get("as_")
    if a_s is not None:
        x_q = jnp.clip(jnp.round(x * (1.0 / a_s)), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_q, layer["wq"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (a_s * layer["ws"][None, :])
                + layer["bias"])
    a = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    a_s = jnp.maximum(a, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x / a_s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, layer["wq"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (a_s * layer["ws"][None, :])
            + layer["bias"])


def quant_forward(model: ResnetValueNet, qparams: Dict,
                  x: jnp.ndarray) -> jnp.ndarray:
    """Encoded states (B, state_dim) -> (B,) values; mirrors
    ResnetValueNet.__call__ eval mode on the folded net."""
    if model.one_hot_depth > 0:
        x = jax.nn.one_hot(x.astype(jnp.int32), model.one_hot_depth,
                           dtype=jnp.int8)
        x = x.reshape(x.shape[0], model.state_dim * model.one_hot_depth)
    # else: binary planes (sokoban) — already {0,1}

    x = jax.nn.relu(_qdense_binary(x, qparams["fc1"]))
    x = jax.nn.relu(_qdense(x, qparams["fc2"]))
    for b in range(model.num_resnet_blocks):
        res = x
        x = jax.nn.relu(_qdense(x, qparams[f"block{b}_fc1"]))
        x = _qdense(x, qparams[f"block{b}_fc2"])
        x = jax.nn.relu(x + res)
    return _qdense(x, qparams["fc_out"])[:, 0]
