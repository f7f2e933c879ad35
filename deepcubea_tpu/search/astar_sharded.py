"""Frontier-sharded batch weighted A*: ONE search spread across the mesh.

`astar.BatchWeightedAStar` scales by running independent instances per
device. This module shards a SINGLE search instance — the node pool, open
list and closed hash table all partition over the mesh "data" axis — for
problems whose frontier outgrows one chip's HBM (the reference's cube3 runs
reach ~2e7 nodes, results/cube3/output.txt; SURVEY.md §5 names frontier
sharding as the sequence-parallelism analogue of this workload).

Design (per `shard_map` shard = one device):
  - pool shard: each device owns pool_capacity/K node slots; global node id
    = device * local_capacity + local slot (parent pointers are global).
  - pop: each device pops the best B/K nodes of ITS shard — an approximate
    global top-B (key->shard assignment is a random hash, so f-quantiles
    balance); weighted A* tolerates pop-order slack exactly as with
    approx_pop.
  - expand + NN heuristic: local, no communication.
  - routing: every child is owned by the device indexed by its fingerprint
    (fp1 & (K-1)); children compact into per-destination staging buffers and
    exchange in one `lax.all_to_all` — the only collective in the loop.
  - dedup/insert: each device dedups received children against its own
    closed-table shard (reopen-if-cheaper) and allocates into its pool
    shard.
  - termination: psum/pmin over shards of (min popped f, best goal f).

The root enters unrecorded in the closed table (it may be re-generated as a
child once; dedup is a performance device, never a correctness one).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..envs.base import Environment, fingerprint, fingerprint_constants
from ..models.resnet import ResnetValueNet
from ..training.heuristic import heuristic_values
from .astar import SolveResult
from .hashtable import HashTable, ht_insert, ht_new

INF_F = jnp.float32(jnp.inf)
AXIS = "data"


@dataclasses.dataclass(frozen=True)
class ShardedAStarConfig:
    weight: float = 1.0
    batch_size: int = 1024        # total nodes popped per iteration (all shards)
    pool_capacity: int = 1 << 20  # total node slots (all shards)
    table_capacity: int = 1 << 21 # total closed-table slots
    max_probes: int = 16
    first_goal: bool = False
    max_path_len: int = 512
    #: staging capacity per destination shard, as a multiple of the
    #: uniform-routing expectation (children/K). The all_to_all ships
    #: K x cap rows instead of the worst-case K x children; a child beyond
    #: its destination's cap is dropped and counted (same safety contract
    #: as pool overflow — dedup/expansion loss, never corruption).
    route_slack: float = 4.0


class ShardedSearchState(NamedTuple):
    states: jnp.ndarray   # (C, W) pool, sharded on axis 0
    g: jnp.ndarray        # (C,)
    f: jnp.ndarray        # (C,)
    parent: jnp.ndarray   # (C,) global ids
    action: jnp.ndarray   # (C,)
    size: jnp.ndarray     # (K,) per-shard allocation cursors
    tbl: HashTable        # (H,) arrays sharded on axis 0
    goal_id: jnp.ndarray  # (K,) per-shard best goal (global id, -1)
    goal_f: jnp.ndarray   # (K,)
    done: jnp.ndarray     # (K,) bool (identical across shards)
    num_generated: jnp.ndarray  # (K,)
    pool_dropped: jnp.ndarray   # (K,) pool-full + over-cap routing drops
    tbl_overflow: jnp.ndarray   # (K,) closed-table probe exhaustions


def sharded_astar_init(env: Environment, cfg: ShardedAStarConfig,
                       root: jnp.ndarray, mesh: Mesh) -> ShardedSearchState:
    k = mesh.shape[AXIS]
    c, h, w = cfg.pool_capacity, cfg.table_capacity, env.state_width
    assert c % k == 0 and h % k == 0 and cfg.batch_size % k == 0

    solved_root = bool(np.asarray(env.is_solved(root[None]))[0])
    states = jnp.zeros((c, w), root.dtype).at[0].set(root)
    shard = NamedSharding(mesh, P(AXIS))
    from .hashtable import INF_G

    state = ShardedSearchState(
        states=states,
        g=jnp.zeros((c,), jnp.int32),
        f=jnp.full((c,), INF_F).at[0].set(0.0),
        parent=jnp.full((c,), -1, jnp.int32),
        action=jnp.full((c,), -1, jnp.int32),
        size=jnp.ones((k,), jnp.int32),  # slot 0 of shard 0 is the root;
        # other shards start at 1 too so local slot 0 stays reserved/simple
        tbl=HashTable(fp0=jnp.zeros((h,), jnp.uint32),
                      fp1=jnp.zeros((h,), jnp.uint32),
                      g=jnp.full((h,), INF_G, jnp.int32),
                      claim=jnp.zeros((h,), jnp.int32)),
        goal_id=jnp.where(jnp.array([solved_root] * k), 0, -1).astype(jnp.int32),
        goal_f=jnp.where(jnp.array([solved_root] * k), 0.0, INF_F),
        done=jnp.array([solved_root] * k),
        num_generated=jnp.zeros((k,), jnp.int32),
        pool_dropped=jnp.zeros((k,), jnp.int32),
        tbl_overflow=jnp.zeros((k,), jnp.int32),
    )
    specs = ShardedSearchState(
        states=shard, g=shard, f=shard, parent=shard, action=shard,
        size=shard, tbl=HashTable(shard, shard, shard, shard),
        goal_id=shard, goal_f=shard, done=shard, num_generated=shard,
        pool_dropped=shard, tbl_overflow=shard)
    return jax.tree_util.tree_map(jax.device_put, state, specs)


def make_sharded_astar_step(env: Environment, model: ResnetValueNet,
                            cfg: ShardedAStarConfig, mesh: Mesh):
    k = mesh.shape[AXIS]
    consts = fingerprint_constants(env.state_width)
    bl = cfg.batch_size // k           # pops per shard
    a = env.num_actions
    w = env.state_width
    cl = cfg.pool_capacity // k        # pool slots per shard
    nc = bl * a                        # children per shard per step
    # staging rows per destination: route_slack x the uniform-routing
    # expectation, padded to a multiple of 8 for layout; never above nc
    cap = nc if k == 1 else min(
        nc, max(8, int(-(-nc * cfg.route_slack // k)) + 7 & ~7))
    nr = k * cap                       # received rows per shard per step
    assert cl > 2 * nr, (
        "per-shard pool must exceed 2x the received-children block "
        "(pool_capacity//K > 2*K*cap)")
    weight = jnp.float32(cfg.weight)

    def local_step(s: ShardedSearchState, params, batch_stats):
        me = jax.lax.axis_index(AXIS)
        live = ~s.done[0]

        # ---- local pop -------------------------------------------------
        neg, pop_idx = jax.lax.top_k(-s.f, bl)
        pop_f = -neg
        popped_real = jnp.isfinite(pop_f) & live
        f_new = jnp.where(
            jnp.zeros((cl,), bool).at[pop_idx].set(popped_real), INF_F, s.f)
        pop_states = s.states[pop_idx]
        pop_g = s.g[pop_idx]
        pop_gid = me * cl + pop_idx    # global ids of popped nodes

        min_pop_f = jnp.min(jnp.where(popped_real, pop_f, INF_F))

        # ---- expand + heuristic (local) ---------------------------------
        children, _tc = env.expand(pop_states)          # (bl, A, W)
        flat = children.reshape(nc, w)
        h_vals = heuristic_values(env, model, params, batch_stats, flat,
                                  clip_zero=True)
        solved = env.is_solved(flat)
        child_g = jnp.repeat(pop_g + 1, a)
        child_f = (weight * child_g.astype(jnp.float32)
                   + h_vals * (1.0 - solved.astype(jnp.float32)))
        child_parent = jnp.repeat(pop_gid, a)
        child_action = jnp.tile(jnp.arange(a, dtype=jnp.int32), bl)
        valid = jnp.repeat(popped_real, a)

        fp0, fp1 = fingerprint(flat, consts)
        dest = (fp1 & jnp.uint32(k - 1)).astype(jnp.int32)

        # ---- compact into per-destination staging + all_to_all ----------
        # single pass (no per-destination loop): each child's rank within
        # its destination comes from a one-hot cumsum (nc x k elementwise
        # work, constant program size in K), then ONE scatter per array
        # lands everything in the (k, cap) staging buffers. cap bounds the
        # exchange to ~route_slack x the uniform-routing occupancy; an
        # over-cap child is dropped and counted like a pool drop.
        oh = (dest[:, None] == jnp.arange(k)[None, :]) & valid[:, None]
        pos = jnp.cumsum(oh.astype(jnp.int32), axis=0) - 1    # (nc, k)
        rank = jnp.take_along_axis(pos, dest[:, None], axis=1)[:, 0]
        ok = valid & (rank < cap)
        send_dropped = jnp.sum((valid & ~ok).astype(jnp.int32))
        slot = jnp.where(ok, dest * cap + rank, k * cap)

        def stage(vals, fill):
            buf = jnp.full((k * cap,) + vals.shape[1:], fill, vals.dtype)
            buf = buf.at[slot].set(vals, mode="drop")
            return buf.reshape((k, cap) + vals.shape[1:])

        send_states = stage(flat, 0)
        send_meta = stage(jnp.stack([child_g, child_parent, child_action,
                                     ok.astype(jnp.int32)], axis=1), 0)
        send_fp = stage(jnp.stack([fp0, fp1], 1).astype(jnp.uint32), 0)
        send_f = stage(child_f, 0.0)

        recv_states = jax.lax.all_to_all(send_states, AXIS, 0, 0, tiled=False)
        recv_meta = jax.lax.all_to_all(send_meta, AXIS, 0, 0, tiled=False)
        recv_fp = jax.lax.all_to_all(send_fp, AXIS, 0, 0, tiled=False)
        recv_f = jax.lax.all_to_all(send_f, AXIS, 0, 0, tiled=False)

        r_states = recv_states.reshape(nr, w)
        r_g = recv_meta[:, :, 0].reshape(-1)
        r_parent = recv_meta[:, :, 1].reshape(-1)
        r_action = recv_meta[:, :, 2].reshape(-1)
        r_valid = recv_meta[:, :, 3].reshape(-1) > 0
        r_fp0 = recv_fp[:, :, 0].reshape(-1)
        r_fp1 = recv_fp[:, :, 1].reshape(-1)
        r_f = recv_f.reshape(-1)
        r_solved = env.is_solved(r_states) & r_valid

        # ---- dedup + allocate into the local shard ----------------------
        # accepted children land contiguously from `size`: compact into a
        # dense buffer + one block write, as in astar.py (the last nr pool
        # rows are slack so the block never clamps; buffer tails carry
        # f=+inf so slack rows never enter the open list)
        tbl, accept, left = ht_insert(s.tbl, r_fp0, r_fp1, r_g, r_valid,
                                      cfg.max_probes)
        ovf = jnp.sum(left.astype(jnp.int32))
        cl_eff = cl - nr
        offs = jnp.cumsum(accept.astype(jnp.int32)) - 1
        local_dest = s.size[0] + offs
        fits = local_dest < cl_eff
        put = accept & fits
        dropped = jnp.sum((accept & ~fits).astype(jnp.int32))
        buf_slot = jnp.where(put, offs, nr)

        def block_write(pool, vals, fill):
            buf = jnp.full((nr,) + vals.shape[1:], fill, pool.dtype)
            buf = buf.at[buf_slot].set(vals.astype(pool.dtype), mode="drop")
            start = (s.size[0],) + (jnp.int32(0),) * (pool.ndim - 1)
            return jax.lax.dynamic_update_slice(pool, buf, start)

        states_new = block_write(s.states, r_states, 0)
        g_new = block_write(s.g, r_g, 0)
        parent_new = block_write(s.parent, r_parent, -1)
        action_new = block_write(s.action, r_action, -1)
        open_f = jnp.where(r_solved, INF_F, r_f)
        f_new = block_write(f_new, open_f, INF_F)
        size_new = s.size + jnp.sum(put.astype(jnp.int32))

        # ---- goal + termination (global reductions) ----------------------
        goal_cand = r_solved & put
        cand_f = jnp.where(goal_cand, r_f, INF_F)
        j = jnp.argmin(cand_f)
        best_f = cand_f[j]
        best_gid = me * cl + local_dest[j]
        improves = best_f < s.goal_f[0]
        goal_f_loc = jnp.where(improves, best_f, s.goal_f[0])
        goal_id_loc = jnp.where(improves, best_gid, s.goal_id[0])

        goal_f_glob = jax.lax.pmin(goal_f_loc, AXIS)
        # the shard holding the global best reports its id; others yield
        is_best = goal_f_loc == goal_f_glob
        goal_id_glob = jax.lax.pmax(
            jnp.where(is_best, goal_id_loc, -1), AXIS)

        min_pop_glob = jax.lax.pmin(min_pop_f, AXIS)
        any_popped = jax.lax.pmax(
            jnp.any(popped_real).astype(jnp.int32), AXIS) > 0
        if cfg.first_goal:
            done = s.done[0] | jnp.isfinite(goal_f_glob) | ~any_popped
        else:
            proof = jnp.isfinite(goal_f_glob) & (min_pop_glob >= goal_f_glob)
            done = s.done[0] | proof | ~any_popped

        gen = s.num_generated[0] + jnp.sum(popped_real.astype(jnp.int32)) * a
        return ShardedSearchState(
            states=states_new, g=g_new, f=f_new, parent=parent_new,
            action=action_new, size=size_new, tbl=tbl,
            goal_id=goal_id_glob[None], goal_f=goal_f_glob[None],
            done=done[None], num_generated=gen[None],
            pool_dropped=(s.pool_dropped[0] + dropped + send_dropped)[None],
            tbl_overflow=(s.tbl_overflow[0] + ovf)[None])

    shard = P(AXIS)
    state_specs = ShardedSearchState(
        states=shard, g=shard, f=shard, parent=shard, action=shard,
        size=shard, tbl=HashTable(shard, shard, shard, shard),
        goal_id=shard, goal_f=shard, done=shard, num_generated=shard,
        pool_dropped=shard, tbl_overflow=shard)

    kwargs = dict(mesh=mesh, in_specs=(state_specs, P(), P()),
                  out_specs=state_specs)
    try:  # manual collectives: disable replication/varying-axis checking
        fn = shard_map(local_step, check_vma=False, **kwargs)
    except TypeError:
        fn = shard_map(local_step, check_rep=False, **kwargs)
    return jax.jit(fn, donate_argnums=(0,))


def make_sharded_path_extractor(cfg: ShardedAStarConfig, mesh: Mesh):
    """Walk parent pointers ON DEVICE over the sharded pool.

    The pool stays sharded: each scan step reads parent/action at a global
    node id by owner-computes + psum (exactly one shard owns any id), so
    result extraction moves only a (max_path_len,) action vector to host —
    the full (C,) pool is never materialized (the round-2 version's
    np.asarray(state.parent) would stall at the 2e7-node scale this module
    targets). Mirrors the lockstep engine's device walk
    (astar.make_path_extractor; reference get_path astar.py:213-229)."""
    k = mesh.shape[AXIS]
    cl = cfg.pool_capacity // k

    def local_extract(parent, action, goal_id):
        me = jax.lax.axis_index(AXIS)

        def read(arr, gid):
            loc = gid - me * cl
            own = (loc >= 0) & (loc < cl)
            v = jnp.where(own, arr[jnp.clip(loc, 0, cl - 1)], 0)
            return jax.lax.psum(v, AXIS)

        def body(nid, _):
            ok = nid >= 0
            act = jnp.where(ok, read(action, nid), -1)
            nxt = jnp.where(ok, read(parent, nid), -1)
            return nxt, act

        _, acts = jax.lax.scan(body, goal_id[0], None,
                               length=cfg.max_path_len)
        return acts  # goal-to-root order, -1 padded; replicated

    kwargs = dict(mesh=mesh, in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                  out_specs=P())
    try:
        fn = shard_map(local_extract, check_vma=False, **kwargs)
    except TypeError:
        fn = shard_map(local_extract, check_rep=False, **kwargs)
    return jax.jit(fn)


class ShardedAStar:
    """Host driver for one frontier-sharded instance."""

    def __init__(self, env: Environment, model: ResnetValueNet, params,
                 batch_stats, cfg: ShardedAStarConfig, mesh: Mesh):
        self.env = env
        self.cfg = cfg
        self.mesh = mesh
        repl = NamedSharding(mesh, P())
        self.params = jax.device_put(params, repl)
        self.batch_stats = jax.device_put(batch_stats, repl)
        self._step = make_sharded_astar_step(env, model, cfg, mesh)
        self._extract = make_sharded_path_extractor(cfg, mesh)

    def solve_one(self, root: jnp.ndarray, max_iters: int = 100_000,
                  verbose: bool = False, log=print) -> SolveResult:
        t0 = time.time()
        state = sharded_astar_init(self.env, self.cfg, jnp.asarray(root),
                                   self.mesh)
        iters = 0
        while iters < max_iters:
            state = self._step(state, self.params, self.batch_stats)
            iters += 1
            done = np.asarray(state.done)
            if verbose and iters % 16 == 0:
                log(f"itr {iters}: nodes {int(np.asarray(state.size).sum()):,}")
            if done.all():
                break

        goal_id = int(np.asarray(state.goal_id)[0])
        solution: Optional[List[int]] = None
        if goal_id >= 0:
            acts = np.asarray(self._extract(state.parent, state.action,
                                            state.goal_id))
            solution = [int(x) for x in acts if x >= 0][::-1]

        return SolveResult(
            solutions=[solution],
            path_costs=np.array([len(solution) if solution is not None else -1]),
            num_generated=np.array([int(np.asarray(state.num_generated).sum())]),
            search_iters=iters, time_s=time.time() - t0,
            pool_dropped=np.array([int(np.asarray(state.pool_dropped).sum())]),
            tbl_overflow=np.array([int(np.asarray(state.tbl_overflow).sum())]),
            finish_iters=np.array([iters], np.int32))


def cfg_max(cfg: ShardedAStarConfig) -> int:
    return cfg.max_path_len
