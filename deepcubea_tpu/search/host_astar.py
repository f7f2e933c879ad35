"""Hybrid host/device BWAS: C++ frontier + closed set, device heuristic.

Mirrors the reference's production architecture — a native search engine
feeding states to an accelerator-served heuristic
(cpp/parallel_weighted_astar.cpp + astar.py:457-637) — but the native side
is an in-process shared library exchanging flat arrays over ctypes, not a
subprocess speaking a hand-framed Unix-socket protocol. The closed set here
is BYTE-EXACT (full-state comparison), making this engine the oracle for
cross-checking the device engine's fingerprint dedup, and the CPU fallback
when no accelerator is present.

Build: `make -C native` (gcc + OpenMP; no external deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.base import Environment
from ..models.resnet import ResnetValueNet
from ..training.heuristic import heuristic_values
from .astar import SolveResult

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdca_native.so")

_lib = None


def build_native(force: bool = False) -> str:
    if force or not os.path.isfile(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def load_native():
    global _lib
    if _lib is not None:
        return _lib
    build_native()
    lib = ctypes.CDLL(_LIB_PATH)
    c = ctypes
    lib.dca_search_new.restype = c.c_void_p
    lib.dca_search_new.argtypes = [c.c_int, c.c_uint64, c.c_double]
    lib.dca_search_free.argtypes = [c.c_void_p]
    lib.dca_push_root.argtypes = [c.c_void_p, c.c_char_p, c.c_int]
    lib.dca_pop.restype = c.c_int64
    lib.dca_pop.argtypes = [c.c_void_p, c.c_int64, c.c_void_p, c.c_void_p,
                            c.c_void_p]
    lib.dca_push_children.argtypes = [c.c_void_p, c.c_int64] + [c.c_void_p] * 6
    for name in ("dca_goal_f", "dca_min_pop_f", "dca_min_open_f"):
        getattr(lib, name).restype = c.c_double
        getattr(lib, name).argtypes = [c.c_void_p]
    for name in ("dca_goal_id", "dca_open_size"):
        getattr(lib, name).restype = c.c_int64
        getattr(lib, name).argtypes = [c.c_void_p]
    for name in ("dca_num_generated", "dca_num_nodes"):
        getattr(lib, name).restype = c.c_uint64
        getattr(lib, name).argtypes = [c.c_void_p]
    lib.dca_extract_path.restype = c.c_int64
    lib.dca_extract_path.argtypes = [c.c_void_p, c.c_int64, c.c_void_p,
                                     c.c_int64]
    _lib = lib
    return lib


class HostAStar:
    """One-instance-at-a-time hybrid BWAS (the reference C++ binary is also
    single-instance per process, cpp:348-396)."""

    def __init__(self, env: Environment, model: ResnetValueNet, params,
                 batch_stats, weight: float = 1.0, batch_size: int = 1000,
                 table_capacity: int = 1 << 20, first_goal: bool = False):
        self.env = env
        self.model = model
        # pin to device once (host numpy pytrees re-transfer per dispatch)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
        self.weight = weight
        self.batch_size = batch_size
        self.table_capacity = table_capacity
        self.first_goal = first_goal
        self.lib = load_native()

        b, a, w = batch_size, env.num_actions, env.state_width

        pinned_params, pinned_stats = self.params, self.batch_stats

        @jax.jit
        def expand_and_eval(states):
            children, _ = env.expand(states)
            flat = children.reshape(b * a, w)
            # close over the PINNED device copies (not the constructor
            # arguments): numpy trees passed by callers would otherwise
            # silently re-transfer on every dispatch
            h = heuristic_values(env, model, pinned_params, pinned_stats,
                                 flat, clip_zero=True)
            solved = env.is_solved(flat)
            return children, h, solved

        self._expand_and_eval = expand_and_eval

    def solve_one(self, root: np.ndarray, max_iters: int = 100_000,
                  max_path_len: int = 4096) -> SolveResult:
        env, lib = self.env, self.lib
        b, a, w = self.batch_size, env.num_actions, env.state_width
        t0 = time.time()

        hs = lib.dca_search_new(w, self.table_capacity, self.weight)
        try:
            root = np.ascontiguousarray(root, dtype=np.uint8)
            solved0 = bool(np.asarray(env.is_solved(jnp.asarray(root[None]))))
            lib.dca_push_root(hs, root.tobytes(), int(solved0))

            pop_states = np.zeros((b, w), np.uint8)
            pop_g = np.zeros((b,), np.int32)
            pop_ids = np.zeros((b,), np.int64)
            iters = 0
            while iters < max_iters:
                iters += 1
                n = lib.dca_pop(hs, b, pop_states.ctypes.data,
                                pop_g.ctypes.data, pop_ids.ctypes.data)
                goal_f = lib.dca_goal_f(hs)
                if n == 0:
                    break  # open exhausted
                if self.first_goal and goal_f != np.inf:
                    break
                if lib.dca_min_pop_f(hs) >= goal_f:
                    break  # C++ proof rule (cpp:205-208)

                # zero-fill the tail so device shapes stay static
                if n < b:
                    pop_states[n:] = 0
                children, h, solved = self._expand_and_eval(
                    jnp.asarray(pop_states))
                children = np.asarray(children[:n]).reshape(n * a, w)
                h = np.asarray(h).reshape(b, a)[:n].reshape(-1)
                solved = np.asarray(solved).reshape(b, a)[:n].reshape(-1)

                parent_ids = np.repeat(pop_ids[:n], a)
                actions = np.tile(np.arange(a, dtype=np.int32), n)
                child_g = np.repeat(pop_g[:n] + 1, a).astype(np.int32)
                # BIND the staging buffers: `.ctypes.data` is a bare int
                # address, so an unbound np.ascontiguousarray temporary
                # (e.g. the bool->uint8 solved copy) is garbage-collected
                # before the C call reads it — this produced spurious
                # "solved" flags and invalid solutions at scale
                ch_c = np.ascontiguousarray(children)
                h_c = np.ascontiguousarray(h, np.float32)
                sv_c = np.ascontiguousarray(solved, np.uint8)
                lib.dca_push_children(
                    hs, n * a, parent_ids.ctypes.data, actions.ctypes.data,
                    ch_c.ctypes.data, child_g.ctypes.data,
                    h_c.ctypes.data, sv_c.ctypes.data)

            goal_id = lib.dca_goal_id(hs)
            solution: Optional[List[int]] = None
            if goal_id >= 0:
                acts = np.zeros((max_path_len,), np.int32)
                ln = lib.dca_extract_path(hs, goal_id, acts.ctypes.data,
                                          max_path_len)
                solution = acts[:ln][::-1].tolist()
            return SolveResult(
                solutions=[solution],
                path_costs=np.array([len(solution) if solution else -1]),
                num_generated=np.array([lib.dca_num_generated(hs)]),
                search_iters=iters, time_s=time.time() - t0,
                pool_dropped=np.zeros(1, np.int32),
                tbl_overflow=np.zeros(1, np.int32))
        finally:
            lib.dca_search_free(hs)
