"""Shared CLI helpers: model/checkpoint resolution.

Accepts either this framework's msgpack checkpoint directories or reference
PyTorch checkpoints (`model_state_dict.pt`, saved at avi.py:234) via the
weight importer — so users of the reference can point the CLIs at their
existing model dirs unchanged.
"""

from __future__ import annotations

import os
from typing import Tuple


def load_model_variables(model_path: str, env,
                         nnet_overrides: dict | None = None,
                         ) -> Tuple[dict, dict, dict]:
    """Returns (params, batch_stats, nnet_config) from `model_path`.

    `nnet_overrides` adjusts the architecture assumed for bare torch
    checkpoints (which carry no shape metadata); our own checkpoints embed
    their config."""
    pt_path = None
    if model_path.endswith(".pt"):
        pt_path = model_path
    elif os.path.isfile(os.path.join(model_path, "model_state_dict.pt")):
        pt_path = os.path.join(model_path, "model_state_dict.pt")
    if pt_path is not None:
        from ..utils.torch_import import import_torch_checkpoint
        nnet_config = dict(env.nnet_config)
        nnet_config.update(nnet_overrides or {})
        params, stats = import_torch_checkpoint(
            pt_path, nnet_config["num_resnet_blocks"])
        return params, stats, nnet_config

    from ..utils.checkpoint import load_checkpoint
    ckpt = load_checkpoint(model_path)
    if ckpt is None:
        raise SystemExit(f"no checkpoint at {model_path}")
    nnet_config = ckpt["meta"].get("nnet_config") or env.nnet_config
    return ckpt["params"], ckpt["batch_stats"], nnet_config
