"""The cost-to-go value network: fully-connected ResNet with BatchNorm.

Architecture mirrors the reference's single model family
(utils/pytorch_models.py:5-86): optional one-hot embed -> Dense(h1) + BN +
ReLU -> Dense(resnet) + BN + ReLU -> num_blocks x [Dense + BN + ReLU +
Dense + BN, residual add, ReLU] -> Dense(out) scalar cost-to-go.

TPU-first choices:
- compute dtype bfloat16 (MXU-native), parameters and BN statistics float32;
  the MSE loss is computed in float32.
- the one-hot embed is never materialized as a huge (B, state_dim * depth)
  int tensor on host; it is fused into the first matmul by XLA (one-hot then
  reshape inside the jitted forward).
- BatchNorm momentum/epsilon match the reference's torch defaults (0.1 /
  1e-5) so learning curves are comparable.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ResnetValueNet(nn.Module):
    state_dim: int
    one_hot_depth: int
    h1_dim: int = 5000
    resnet_dim: int = 1000
    num_resnet_blocks: int = 4
    out_dim: int = 1
    batch_norm: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def _bn(self, name: str):
        # torch BatchNorm1d defaults: momentum 0.1 (=> flax momentum 0.9),
        # eps 1e-5 (utils/pytorch_models.py:22)
        return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.one_hot_depth > 0:
            x = jax.nn.one_hot(x.astype(jnp.int32), self.one_hot_depth,
                               dtype=self.dtype)
            x = x.reshape(x.shape[0], self.state_dim * self.one_hot_depth)
        else:
            x = x.astype(self.dtype)

        dense = lambda d, name: nn.Dense(  # noqa: E731
            d, dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        x = dense(self.h1_dim, "fc1")(x)
        if self.batch_norm:
            x = self._bn("bn1")(x, use_running_average=not train)
        x = nn.relu(x)

        x = dense(self.resnet_dim, "fc2")(x)
        if self.batch_norm:
            x = self._bn("bn2")(x, use_running_average=not train)
        x = nn.relu(x)

        for b in range(self.num_resnet_blocks):
            res = x
            x = dense(self.resnet_dim, f"block{b}_fc1")(x)
            if self.batch_norm:
                x = self._bn(f"block{b}_bn1")(x, use_running_average=not train)
            x = nn.relu(x)
            x = dense(self.resnet_dim, f"block{b}_fc2")(x)
            if self.batch_norm:
                x = self._bn(f"block{b}_bn2")(x, use_running_average=not train)
            x = nn.relu(x + res)

        x = dense(self.out_dim, "fc_out")(x)
        return x.astype(jnp.float32)


def build_model(nnet_config: Dict, dtype=jnp.bfloat16) -> ResnetValueNet:
    return ResnetValueNet(dtype=dtype, **nnet_config)


def init_variables(model: ResnetValueNet, key: jax.Array,
                   example_input: jnp.ndarray) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats)."""
    variables = model.init(key, example_input, train=False)
    return variables["params"], variables.get("batch_stats", {})


def forward_eval(model: ResnetValueNet, params, batch_stats,
                 x: jnp.ndarray) -> jnp.ndarray:
    """Inference forward using running BN statistics (the reference serves
    heuristics with nnet.eval(), nnet_utils.py:151)."""
    out = model.apply({"params": params, "batch_stats": batch_stats}, x,
                      train=False)
    return out[:, 0]


def forward_train(model: ResnetValueNet, params, batch_stats,
                  x: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
    """Training forward with batch statistics; returns (values, new_stats)."""
    out, updates = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=True,
        mutable=["batch_stats"])
    return out[:, 0], updates["batch_stats"]


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
