"""Filesystem checkpointing with the reference's directory layout.

The reference persists `current/` (live net) and `target/` (frozen Bellman
target) under saved_models/<name>/, with model_state_dict.pt +
train_itr.pkl + update_num.pkl (avi.py:234-236) and promotes current ->
target by copying files (avi.py:121-126). Here each directory holds a
msgpack pytree snapshot (params + batch_stats) plus a JSON meta record
(itr, update_num, PRNG key, config snapshot — the reference's args.pkl
equivalent, avi.py:110-114); promotion is a file copy as well, so resume
semantics match.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

PARAMS_FILE = "model.msgpack"
META_FILE = "meta.json"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, params, batch_stats,
                    meta: Optional[Dict[str, Any]] = None) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    blob = serialization.msgpack_serialize(
        {"params": _to_host(params), "batch_stats": _to_host(batch_stats)})
    tmp = os.path.join(ckpt_dir, PARAMS_FILE + ".tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(ckpt_dir, PARAMS_FILE))
    if meta is not None:
        with open(os.path.join(ckpt_dir, META_FILE), "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_checkpoint(ckpt_dir: str) -> Optional[Dict[str, Any]]:
    """Returns {"params", "batch_stats", "meta"} or None if absent
    (silent fresh start, matching reference avi.py:162-173)."""
    path = os.path.join(ckpt_dir, PARAMS_FILE)
    if not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    meta = {}
    meta_path = os.path.join(ckpt_dir, META_FILE)
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return {"params": tree["params"], "batch_stats": tree["batch_stats"],
            "meta": meta}


def promote_to_target(curr_dir: str, targ_dir: str) -> None:
    """current -> target (reference copy_files, avi.py:121-126)."""
    os.makedirs(targ_dir, exist_ok=True)
    for name in (PARAMS_FILE, META_FILE):
        src = os.path.join(curr_dir, name)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(targ_dir, name))
