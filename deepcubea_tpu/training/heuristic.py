"""Heuristic (cost-to-go) evaluation.

The reference runs a multi-process heuristic *service*: one server process
per GPU fed by queues (utils/nnet_utils.py:156-311) or a Unix socket bridge
for the C++ search (search_methods/astar.py:571-637). On TPU the search and
the network live on the same device inside the same jitted program, so the
service collapses into a traced function call; only the host-facing chunked
wrapper remains for arbitrary-size eval requests.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.base import Environment
from ..models.resnet import ResnetValueNet, forward_eval


def heuristic_values(env: Environment, model: ResnetValueNet, params,
                     batch_stats, states: jnp.ndarray,
                     clip_zero: bool = False) -> jnp.ndarray:
    """(B, W) states -> (B,) cost-to-go. Traceable; call inside jit.

    clip_zero mirrors the reference's max(ctg, 0) for search serving
    (nnet_utils.py:193-194).

    `params` may be an int8 serving tree from models.quant.quantize_serving
    (pass batch_stats={} then); the marker key routes to the quantized
    forward, so all search engines pick up --int8 without code changes.
    """
    from ..models.quant import is_quantized, quant_forward
    if is_quantized(params):
        h = quant_forward(model, params, env.encode(states))
    else:
        h = forward_eval(model, params, batch_stats, env.encode(states))
    if clip_zero:
        h = jnp.maximum(h, 0.0)
    return h


def make_host_heuristic(env: Environment, model: ResnetValueNet,
                        clip_zero: bool = False,
                        chunk_size: int = 10000) -> Callable:
    """Host-facing heuristic over arbitrary-length numpy batches.

    Pads the trailing chunk to keep shapes static (one compile), mirroring
    the chunked loop of the reference heuristic_fn (nnet_utils.py:171-189).
    Returns fn(params, batch_stats, states_np) -> np.ndarray.
    """

    @functools.partial(jax.jit, static_argnames=())
    def _chunk(params, batch_stats, states):
        return heuristic_values(env, model, params, batch_stats, states,
                                clip_zero=clip_zero)

    def fn(params, batch_stats, states_np: np.ndarray) -> np.ndarray:
        n = states_np.shape[0]
        out = np.empty((n,), dtype=np.float32)
        for start in range(0, n, chunk_size):
            end = min(start + chunk_size, n)
            chunk = states_np[start:end]
            if end - start < chunk_size:
                pad = np.zeros((chunk_size - (end - start),) + chunk.shape[1:],
                               dtype=chunk.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            vals = _chunk(params, batch_stats, jnp.asarray(chunk))
            out[start:end] = np.asarray(vals)[: end - start]
        return out

    return fn
