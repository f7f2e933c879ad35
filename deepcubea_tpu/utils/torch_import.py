"""Import reference PyTorch checkpoints into this framework.

Users of the reference hold trained `model_state_dict.pt` files
(saved via torch.save at avi.py:234, loaded at nnet_utils.py:134-152).
This converts such a state dict into (params, batch_stats) for
`models.resnet.ResnetValueNet`, which is architecturally identical
(utils/pytorch_models.py:5-86): Linear kernels transpose, BatchNorm
weight/bias map to scale/bias and running statistics to batch_stats.
DataParallel's "module." prefix is stripped (nnet_utils.py:142-145).

torch is NOT required unless loading an actual .pt file; plain dicts of
numpy arrays convert directly (so tests and tools can stay torch-free).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def import_torch_state_dict(state_dict: Dict, num_resnet_blocks: int = 4,
                            ) -> Tuple[Dict, Dict]:
    """torch state dict -> (params, batch_stats) pytrees."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in state_dict.items()}

    def dense(prefix):
        return dict(kernel=_np(sd[f"{prefix}.weight"]).T,
                    bias=_np(sd[f"{prefix}.bias"]))

    def bn(prefix):
        p = dict(scale=_np(sd[f"{prefix}.weight"]),
                 bias=_np(sd[f"{prefix}.bias"]))
        s = dict(mean=_np(sd[f"{prefix}.running_mean"]),
                 var=_np(sd[f"{prefix}.running_var"]))
        return p, s

    params: Dict = {}
    stats: Dict = {}
    params["fc1"] = dense("fc1")
    params["fc2"] = dense("fc2")
    params["fc_out"] = dense("fc_out")
    if "bn1.weight" in sd:
        params["bn1"], stats["bn1"] = bn("bn1")
        params["bn2"], stats["bn2"] = bn("bn2")
    for i in range(num_resnet_blocks):
        # reference block layout: ModuleList [fc1, bn1, fc2, bn2]
        # (pytorch_models.py:30-40)
        params[f"block{i}_fc1"] = dense(f"blocks.{i}.0")
        params[f"block{i}_fc2"] = dense(f"blocks.{i}.2")
        if f"blocks.{i}.1.weight" in sd:
            params[f"block{i}_bn1"], stats[f"block{i}_bn1"] = bn(f"blocks.{i}.1")
            params[f"block{i}_bn2"], stats[f"block{i}_bn2"] = bn(f"blocks.{i}.3")
    return params, stats


def import_torch_checkpoint(pt_path: str, num_resnet_blocks: int = 4,
                            ) -> Tuple[Dict, Dict]:
    """Load a reference model_state_dict.pt (requires torch, CPU)."""
    import torch

    sd = torch.load(pt_path, map_location="cpu")
    return import_torch_state_dict(sd, num_resnet_blocks)
