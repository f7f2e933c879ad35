"""Batch Weighted A* (BWAS), resident on the accelerator.

This one module replaces BOTH reference search engines:
  - the Python multi-instance A* (search_methods/astar.py:18-341): heapq
    open lists, Dict closed sets, Node objects, one NN call per step;
  - the C++ binary + Unix-socket heuristic bridge
    (cpp/parallel_weighted_astar.cpp, astar.py:457-637): OpenMP expansion
    on host, every iteration shipping batch*num_actions*state_dim bytes
    through the kernel to per-GPU server processes.

Design (SURVEY.md §7.6): per instance, a fixed-capacity device node pool
(states, g, f, parent, action) doubles as the open list — f = +inf marks
"not in open"; popping the best B nodes is a top-k over f instead of a heap
(the spec is "pop the B lowest-cost nodes", astar.py:69-76; FIFO tie-breaks
are not reproduced). The closed set is the double-hashed fingerprint table
of `hashtable.py` with the reopen-if-cheaper rule (astar.py:78-90). One
search iteration — pop, expand, heuristic, dedup, push — is a single jitted
program; the NN heuristic evaluates in the same program with zero IPC.
Many instances run in lockstep as a leading batch axis (the reference solves
test states sequentially, astar.py:416).

Costs: f = w * g + h * (1 - solved) (astar.py:196; cpp:292-306). Termination
follows the C++ batch rule — keep searching until the cheapest popped f is
no better than the best goal found (cpp:184-208) — or optionally the Python
rule of stopping at the first goal (astar.py:421-423).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.quiesce import check_quiesce
from ..envs.base import Environment, fingerprint, fingerprint_constants
from ..models.resnet import ResnetValueNet
from ..training.heuristic import heuristic_values
from .hashtable import HashTable, ht_insert, ht_lookup, ht_new

INF_F = jnp.float32(jnp.inf)


@dataclasses.dataclass(frozen=True)
class AStarConfig:
    weight: float = 1.0           # per-run default; per-instance override in init
    batch_size: int = 1000        # nodes popped per instance per iteration
    pool_capacity: int = 1 << 20  # node pool slots per instance
    #: closed-table slots per instance. Size at >= 2x pool_capacity: past
    #: ~75% load the insert kernel's compacted passes 2..k (width
    #: m = 8*n^2/H, hashtable.py) can no longer hold the pass-1 pending
    #: set, and the surplus silently degrades to overflow-accepts
    #: (re-expansion churn, visible only via tbl_overflow) exactly when
    #: pool pressure is worst (ADVICE r3)
    table_capacity: int = 1 << 21
    max_probes: int = 16
    first_goal: bool = False      # True = Python semantics (stop at first goal)
    approx_pop: bool = False      # use approx top-k (faster on TPU, ~same quality)
    max_path_len: int = 512
    #: fraction of batch_size * num_actions children evaluated by the net
    #: per step. Children are deduped FIRST; only accepted ones consume NN
    #: budget (the reference C++ ships every child to the GPU,
    #: cpp:236-237). Accepted children beyond the budget are pushed with
    #: the provisional heuristic max(h_parent - 1, 0) — the C++ binary's
    #: own placeholder rule (cpp:224-225) — so nothing is lost.
    eval_budget_fraction: float = 1.0


class SearchState(NamedTuple):
    states: jnp.ndarray   # (I, C, W) uint8
    g: jnp.ndarray        # (I, C) int32
    f: jnp.ndarray        # (I, C) f32; +inf = not in open
    h: jnp.ndarray        # (I, C) f32 heuristic at insert (real or provisional)
    parent: jnp.ndarray   # (I, C) int32 pool slot of parent, -1 for root
    action: jnp.ndarray   # (I, C) int32 action from parent, -1 for root
    size: jnp.ndarray     # (I,) int32 allocated nodes
    tbl: HashTable        # (I, H) arrays
    weight: jnp.ndarray   # (I,) f32
    goal_id: jnp.ndarray  # (I,) int32, -1 until found
    goal_f: jnp.ndarray   # (I,) f32, +inf until found
    done: jnp.ndarray     # (I,) bool
    num_generated: jnp.ndarray  # (I,) int64-ish int32 counts
    pool_dropped: jnp.ndarray   # (I,) int32 children lost to pool overflow
    tbl_overflow: jnp.ndarray   # (I,) int32 closed-table probe exhaustions
    finish_iters: jnp.ndarray   # (I,) int32 steps consumed before this
    #                             instance terminated (for honest per-state
    #                             wall-time attribution in lockstep batches)


def _fp_consts(env: Environment) -> np.ndarray:
    return fingerprint_constants(env.state_width)


def astar_init(env: Environment, cfg: AStarConfig,
               roots: jnp.ndarray,
               weights: Optional[jnp.ndarray] = None) -> SearchState:
    """Build the initial search state for I root states (I, W)."""
    i = roots.shape[0]
    c, h, w = cfg.pool_capacity, cfg.table_capacity, env.state_width
    if weights is None:
        weights = jnp.full((i,), cfg.weight, jnp.float32)

    states = jnp.zeros((i, c, w), roots.dtype).at[:, 0, :].set(roots)
    g = jnp.zeros((i, c), jnp.int32)
    f = jnp.full((i, c), INF_F).at[:, 0].set(0.0)  # root pops first
    h_arr = jnp.zeros((i, c), jnp.float32)
    parent = jnp.full((i, c), -1, jnp.int32)
    action = jnp.full((i, c), -1, jnp.int32)

    from .hashtable import INF_G
    tbl = HashTable(fp0=jnp.zeros((i, h), jnp.uint32),
                    fp1=jnp.zeros((i, h), jnp.uint32),
                    g=jnp.full((i, h), INF_G, jnp.int32),
                    claim=jnp.zeros((i, h), jnp.int32))
    consts = _fp_consts(env)
    fp0, fp1 = fingerprint(roots, consts)
    # flat multi-instance insert: one op over the concatenated tables
    tblf = HashTable(*(x.reshape(-1) for x in tbl))
    tblf, _, _ = ht_insert(tblf, fp0, fp1, jnp.zeros((i,), jnp.int32),
                           jnp.ones((i,), bool), cfg.max_probes,
                           base=jnp.arange(i, dtype=jnp.int32) * h,
                           inst_capacity=h)
    tbl = HashTable(*(x.reshape(i, h) for x in tblf))

    solved_root = env.is_solved(roots)
    return SearchState(
        states=states, g=g, f=f, h=h_arr, parent=parent, action=action,
        size=jnp.ones((i,), jnp.int32), tbl=tbl,
        weight=jnp.asarray(weights, jnp.float32),
        goal_id=jnp.where(solved_root, 0, -1).astype(jnp.int32),
        goal_f=jnp.where(solved_root, 0.0, INF_F),
        done=solved_root,
        num_generated=jnp.zeros((i,), jnp.int32),
        pool_dropped=jnp.zeros((i,), jnp.int32),
        tbl_overflow=jnp.zeros((i,), jnp.int32),
        finish_iters=jnp.zeros((i,), jnp.int32),
    )


def make_astar_step(env: Environment, model: ResnetValueNet,
                    cfg: AStarConfig):
    """Compile one BWAS iteration over all instances."""
    consts = _fp_consts(env)
    b = cfg.batch_size
    a = env.num_actions
    w = env.state_width
    assert cfg.pool_capacity > 2 * b * a, (
        "pool_capacity must exceed 2*batch_size*num_actions (the last "
        "batch-of-children rows are block-write slack)")

    # donating the search state lets XLA update the node pool and hash
    # table in place instead of copying hundreds of MB per iteration
    @partial(jax.jit, donate_argnums=(0,))
    def step(s: SearchState, params, batch_stats) -> SearchState:
        i, c = s.f.shape

        # ---- pop the B best open nodes per instance (astar.py:69-76) ----
        if cfg.approx_pop:
            neg, pop_idx = jax.lax.approx_max_k(-s.f, b, recall_target=0.95)
        else:
            neg, pop_idx = jax.lax.top_k(-s.f, b)
        pop_f = -neg                                   # (I, B)
        live = ~s.done
        popped_real = jnp.isfinite(pop_f) & live[:, None]
        # every really-popped node leaves the open list, stale or not
        f_new = jnp.where(
            jnp.zeros((i, c), bool).at[jnp.arange(i)[:, None], pop_idx].set(popped_real),
            INF_F, s.f)

        rows = jnp.arange(i)[:, None]
        pop_states = s.states[rows, pop_idx]           # (I, B, W)
        pop_g = s.g[rows, pop_idx]                     # (I, B)

        # ---- stale-pop rejection: a cheaper copy was already expanded ----
        # table ops run FLAT over the concatenated per-instance tables
        # (base-offset probing): one latency-bound gather/scatter chain for
        # all instances instead of I vmapped chains (r3 sweep: I=2 cost
        # 3.3x an I=1 step under the vmapped form)
        ht_cap = s.tbl.fp0.shape[1]
        tblf = HashTable(*(x.reshape(-1) for x in s.tbl))
        inst_base = jnp.arange(i, dtype=jnp.int32) * ht_cap
        pfp0, pfp1 = fingerprint(pop_states.reshape(i * b, w), consts)
        g_best = ht_lookup(tblf, pfp0, pfp1, cfg.max_probes,
                           base=jnp.repeat(inst_base, b),
                           inst_capacity=ht_cap).reshape(i, b)
        valid_pop = popped_real & (pop_g <= g_best)

        # ---- expand all children in one env call (astar.py:99-170) ------
        flat_pop = pop_states.reshape(i * b, w)
        children, _tc = env.expand(flat_pop)           # (I*B, A, W)
        flat_ch = children.reshape(i * b * a, w)
        child_g = jnp.broadcast_to((pop_g + 1)[:, :, None],
                                   (i, b, a)).reshape(i, b * a)
        valid_ch = jnp.repeat(valid_pop, a, axis=1)    # (I, B*A)
        solved = env.is_solved(flat_ch).reshape(i, b * a)

        # ---- closed-set dedup + reopen FIRST (astar.py:78-90) -----------
        cfp0, cfp1 = fingerprint(flat_ch, consts)
        tblf, accept_f, leftover = ht_insert(
            tblf, cfp0, cfp1, child_g.reshape(-1), valid_ch.reshape(-1),
            cfg.max_probes, base=jnp.repeat(inst_base, b * a),
            inst_capacity=ht_cap)
        tbl = HashTable(*(x.reshape(i, ht_cap) for x in tblf))
        accept = accept_f.reshape(i, b * a)
        ovf = leftover.reshape(i, b * a).sum(axis=1)
        offs = jnp.cumsum(accept.astype(jnp.int32), axis=1) - 1

        # ---- heuristic: accepted children only, up to the NN budget ------
        # (the reference C++ evaluates every child before dedup,
        # cpp:236-237; evaluating survivors only cuts the dominant cost)
        n_eval = max(1, int(round(b * a * cfg.eval_budget_fraction)))
        pop_h = s.h[rows, pop_idx]                     # (I, B)
        prov_h = jnp.maximum(
            jnp.repeat(pop_h - 1.0, a, axis=1), 0.0)   # cpp:224-225
        if n_eval >= b * a:
            h_flat = heuristic_values(env, model, params, batch_stats,
                                      flat_ch, clip_zero=True)
            h_vals = jnp.where(accept, h_flat.reshape(i, b * a), prov_h)
        else:
            sel = accept & (offs < n_eval)
            rows_i = jnp.arange(i)[:, None]
            slot = jnp.where(sel, offs, n_eval)
            buf = jnp.zeros((i, n_eval, w), flat_ch.dtype)
            buf = jax.vmap(lambda bu, sl, v: bu.at[sl].set(v, mode="drop"))(
                buf, slot, flat_ch.reshape(i, b * a, w))
            h_buf = heuristic_values(env, model, params, batch_stats,
                                     buf.reshape(i * n_eval, w),
                                     clip_zero=True).reshape(i, n_eval)
            h_back = h_buf[rows_i, jnp.minimum(slot, n_eval - 1)]
            h_vals = jnp.where(sel, h_back, prov_h)

        child_f = (s.weight[:, None] * child_g.astype(jnp.float32)
                   + h_vals * (1.0 - solved.astype(jnp.float32)))

        # ---- allocate accepted children into the pool -------------------
        # Accepted children land at contiguous slots (offs is a dense prefix
        # sum), so instead of a row scatter into the C-row pool (~6x slower
        # for uint8 rows on TPU) each array compacts its accepted entries
        # into a dense (B*A)-row buffer and writes ONE contiguous block at
        # row `size`. The last B*A pool rows are slack so the block write
        # never clamps; `fits` keeps `size` (and all referenced nodes)
        # below c_eff, and buffer tails carry f=+inf so slack rows never
        # enter the open list.
        c_eff = c - b * a
        dest = s.size[:, None] + offs                  # (I, B*A)
        fits = dest < c_eff
        put = accept & fits
        dropped = jnp.sum((accept & ~fits).astype(jnp.int32), axis=1)
        buf_slot = jnp.where(put, offs, b * a)         # b*a = dropped

        ch_states = flat_ch.reshape(i, b * a, w)
        parent_slot = jnp.repeat(pop_idx, a, axis=1)
        act_ids = jnp.tile(jnp.arange(a, dtype=jnp.int32), b)[None, :]

        def block_write(pool, vals, fill):
            def one(p, sl, v, start):
                buf = jnp.full((b * a,) + v.shape[1:], fill, p.dtype)
                buf = buf.at[sl].set(v.astype(p.dtype), mode="drop")
                start_idx = (start,) + (jnp.int32(0),) * (p.ndim - 1)
                return jax.lax.dynamic_update_slice(p, buf, start_idx)
            return jax.vmap(one)(pool, buf_slot, vals, s.size)

        states_new = block_write(s.states, ch_states, 0)
        g_new = block_write(s.g, child_g, 0)
        h_new = block_write(s.h, h_vals, 0.0)
        parent_new = block_write(s.parent, parent_slot, -1)
        action_new = block_write(
            s.action, jnp.broadcast_to(act_ids, (i, b * a)), -1)
        # solved children are terminal: never re-expanded (goal tracked below)
        open_f = jnp.where(solved, INF_F, child_f)
        f_new = block_write(f_new, open_f, INF_F)
        size_new = s.size + jnp.sum(put.astype(jnp.int32), axis=1)

        # ---- goal tracking ----------------------------------------------
        goal_cand = solved & put
        cand_f = jnp.where(goal_cand, child_f, INF_F)
        best_j = jnp.argmin(cand_f, axis=1)
        best_f = cand_f[jnp.arange(i), best_j]
        improves = best_f < s.goal_f
        goal_f = jnp.where(improves, best_f, s.goal_f)
        goal_id = jnp.where(improves, dest[jnp.arange(i), best_j], s.goal_id)

        # ---- termination ---------------------------------------------------
        # C++ batch rule (cpp:184-208): the cheapest node left to expand can
        # no longer beat the best goal. Measured as the TRUE min f over the
        # open list after this iteration's push — one bandwidth-bound
        # reduction over the pool f array (~0.1 ms at 32M) — NOT the min of
        # the popped batch: under approx_pop the popped batch can miss the
        # true open min, which fired the proof EARLY and inflated solution
        # lengths +2..+8 moves (r4 puzzle35 finding, commit ee05eb9). With
        # this rule the proof is exact for both pop modes; approx_pop only
        # perturbs expansion ORDER, never the optimality bound.
        # Python rule: first goal found.
        # exhausted = nothing at all came off the open list (an all-stale
        # pop round is NOT exhaustion; real nodes may remain)
        exhausted = ~jnp.any(popped_real, axis=1)
        open_min_f = jnp.min(f_new, axis=1)
        proof = jnp.isfinite(goal_f) & (open_min_f >= goal_f)
        if cfg.first_goal:
            done = s.done | jnp.isfinite(goal_f) | exhausted
        else:
            done = s.done | proof | exhausted

        return SearchState(
            states=states_new, g=g_new, f=f_new, h=h_new, parent=parent_new,
            action=action_new, size=size_new, tbl=tbl, weight=s.weight,
            goal_id=goal_id, goal_f=goal_f, done=done,
            num_generated=s.num_generated
            + jnp.sum(valid_pop.astype(jnp.int32), axis=1) * a,
            pool_dropped=s.pool_dropped + dropped,
            tbl_overflow=s.tbl_overflow + jnp.where(live, ovf, 0),
            finish_iters=s.finish_iters + live.astype(jnp.int32),
        )

    return step


def make_slot_reset(env: Environment, cfg: AStarConfig):
    """Jitted masked re-initialization of finished instance rows with fresh
    roots — the replace-on-finish engine of `solve_stream`.

    Only what controls reachability is rewritten: row f (open membership),
    slot 0 (the new root), size, the closed-table fp0 row (fp0 == 0 marks
    empty; stale fp1/g/claim words are never read before being rewritten),
    and the counters. The old pool rows stay in HBM but are unreachable —
    resetting costs one table-row sweep instead of a pool rebuild.
    """
    consts = _fp_consts(env)

    @partial(jax.jit, donate_argnums=(0,))
    def reset(s: SearchState, mask: jnp.ndarray, new_roots: jnp.ndarray,
              new_weights: jnp.ndarray,
              park: Optional[jnp.ndarray] = None) -> SearchState:
        m1 = mask[:, None]
        solved_root = env.is_solved(new_roots)

        states = s.states.at[:, 0, :].set(
            jnp.where(m1, new_roots, s.states[:, 0, :]))
        f = jnp.where(m1, INF_F, s.f)
        f = f.at[:, 0].set(jnp.where(mask, 0.0, s.f[:, 0]))
        g = s.g.at[:, 0].set(jnp.where(mask, 0, s.g[:, 0]))
        h = s.h.at[:, 0].set(jnp.where(mask, 0.0, s.h[:, 0]))
        parent = s.parent.at[:, 0].set(
            jnp.where(mask, -1, s.parent[:, 0]))
        action = s.action.at[:, 0].set(
            jnp.where(mask, -1, s.action[:, 0]))

        tbl = s.tbl._replace(fp0=jnp.where(m1, jnp.uint32(0), s.tbl.fp0))
        rfp0, rfp1 = fingerprint(new_roots, consts)

        n_i = mask.shape[0]
        cap = tbl.fp0.shape[1]
        tblf = HashTable(*(x.reshape(-1) for x in tbl))
        tblf, _, _ = ht_insert(tblf, rfp0, rfp1,
                               jnp.zeros((n_i,), jnp.int32), mask,
                               cfg.max_probes,
                               base=jnp.arange(n_i, dtype=jnp.int32) * cap,
                               inst_capacity=cap)
        tbl = HashTable(*(x.reshape(n_i, cap) for x in tblf))

        # parked rows (stream drained, no replacement root): done=True stops
        # their pops permanently -- the step's `live` gate makes every parked
        # slot a no-op instead of an until-drain useless popper
        done = jnp.where(mask, solved_root, s.done)
        if park is not None:
            done = done | park
        fresh0 = lambda x: jnp.where(mask, 0, x)  # noqa: E731
        return SearchState(
            states=states, g=g, f=f, h=h, parent=parent, action=action,
            size=jnp.where(mask, 1, s.size), tbl=tbl,
            weight=jnp.where(mask, new_weights, s.weight),
            goal_id=jnp.where(mask,
                              jnp.where(solved_root, 0, -1), s.goal_id),
            goal_f=jnp.where(mask,
                             jnp.where(solved_root, 0.0, INF_F), s.goal_f),
            done=done,
            num_generated=fresh0(s.num_generated),
            pool_dropped=fresh0(s.pool_dropped),
            tbl_overflow=fresh0(s.tbl_overflow),
            finish_iters=fresh0(s.finish_iters))

    return reset


def make_path_extractor(cfg: AStarConfig):
    """Walk parent pointers on device (astar.py:213-229), newest-first."""

    @jax.jit
    def extract(s: SearchState) -> Tuple[jnp.ndarray, jnp.ndarray]:
        def one(parent, action, goal_id):
            def body(carry, _):
                nid = carry
                ok = nid >= 0
                act = jnp.where(ok, action[nid], -1)
                nxt = jnp.where(ok, parent[nid], -1)
                return nxt, act

            _, acts = jax.lax.scan(body, goal_id, None,
                                   length=cfg.max_path_len)
            return acts  # goal-to-root order, -1 padded (root action = -1)

        acts = jax.vmap(one)(s.parent, s.action, s.goal_id)
        lengths = jnp.sum((acts >= 0).astype(jnp.int32), axis=1)
        return acts, lengths

    return extract


class SolveResult(NamedTuple):
    solutions: List[Optional[List[int]]]  # move sequences root -> goal
    path_costs: np.ndarray                # (I,) solution lengths (unit costs)
    num_generated: np.ndarray             # (I,)
    search_iters: int
    time_s: float
    pool_dropped: np.ndarray
    tbl_overflow: np.ndarray
    finish_iters: Optional[np.ndarray] = None  # (I,) per-instance steps


class BatchWeightedAStar:
    """Host driver: repeatedly dispatch the jitted step until every instance
    terminates, then reconstruct paths on device.

    The only host<->device traffic per iteration is the (I,) done vector;
    compare the reference C++ path which serializes every child state over a
    Unix socket each iteration (cpp:236-237, astar.py:579-616).
    """

    def __init__(self, env: Environment, model: ResnetValueNet, params,
                 batch_stats, cfg: AStarConfig, mesh=None):
        """With `mesh`, instances shard over the "data" axis: independent
        searches per device, parameters replicated — search-frontier
        scaling across chips (SURVEY.md §5 'long-context' analogue). The
        instance count must divide by the data-axis size."""
        self.env = env
        self.model = model
        # pin to device once: host numpy pytrees (e.g. fresh checkpoint
        # loads) would otherwise re-transfer per step dispatch
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
        self.cfg = cfg
        self.mesh = mesh
        self._step = make_astar_step(env, model, cfg)
        self._multi: dict = {}  # k -> jitted k-step fused dispatch
        self._extract = make_path_extractor(cfg)
        self._reset = make_slot_reset(env, cfg)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._inst_sharding = NamedSharding(mesh, P("data"))
            self._repl_sharding = NamedSharding(mesh, P())
        else:
            self._inst_sharding = None

    def _shard_state(self, state: SearchState) -> SearchState:
        if self._inst_sharding is None:
            return state
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._inst_sharding), state)

    def _steps(self, state: SearchState, k: int) -> SearchState:
        """Advance the search k iterations in ONE device dispatch.

        k host-queued step dispatches cost k fixed per-dispatch overheads
        (dominant at small B*I — sokoban's B=2 x I=16 step ran 150-200 ms
        where ~10-20 ms is device work, r4 profile), and with full donation
        their argument buffers repeat addresses, exposing them to the axon
        layer's in-flight byte-identical dispatch dedup (the r4 bench
        hazard, commit 6af68cc). One fused `fori_loop` dispatch has neither
        problem; the body is traced once so compile cost matches a single
        step. Done instances are masked inside the step (live = ~done), so
        fusing never over-advances finish_iters."""
        if k == 1:
            return self._step(state, self.params, self.batch_stats)
        fn = self._multi.get(k)
        if fn is None:
            step = self._step
            fn = jax.jit(
                lambda s, p, bs: jax.lax.fori_loop(
                    0, k, lambda _, x: step(x, p, bs), s),
                donate_argnums=(0,))
            self._multi[k] = fn
        return fn(state, self.params, self.batch_stats)

    def solve(self, roots: jnp.ndarray,
              weights: Optional[np.ndarray] = None,
              max_iters: int = 100_000,
              check_every: int = 1,
              verbose: bool = False,
              log=print) -> SolveResult:
        t0 = time.time()
        state = astar_init(self.env, self.cfg, roots,
                           None if weights is None else jnp.asarray(weights))
        state = self._shard_state(state)
        if self._inst_sharding is not None:
            self.params = jax.device_put(self.params, self._repl_sharding)
            self.batch_stats = jax.device_put(self.batch_stats,
                                              self._repl_sharding)
        iters = 0
        while iters < max_iters:
            state = self._steps(state, check_every)
            iters += check_every
            done = np.asarray(state.done)
            if verbose:
                # open/closed-size + overflow breakdown, the analogue of the
                # reference C++ per-iteration stats print
                # (cpp/parallel_weighted_astar.cpp:323-327); phase *times*
                # are deliberately left to jax.profiler (utils/profiling.py).
                fill = jnp.mean(
                    jnp.sum(state.tbl.fp0 != 0, axis=1)
                    / state.tbl.fp0.shape[1])
                log(f"itr {iters}: done {int(done.sum())}/{done.size}, "
                    f"nodes {int(np.asarray(state.size).max()):,}, "
                    f"closed {float(fill):.1%} full, "
                    f"dropped {int(np.asarray(state.pool_dropped).max()):,}, "
                    f"tbl_ovf {int(np.asarray(state.tbl_overflow).max()):,}")
            if done.all():
                break

        acts, lengths = self._extract(state)
        acts_np = np.asarray(acts)
        lengths_np = np.asarray(lengths)
        goal_found = np.asarray(state.goal_id) >= 0

        solutions: List[Optional[List[int]]] = []
        for idx in range(acts_np.shape[0]):
            if not goal_found[idx]:
                solutions.append(None)
                continue
            seq = [int(x) for x in acts_np[idx] if x >= 0]
            seq.reverse()  # root -> goal
            solutions.append(seq)

        return SolveResult(
            solutions=solutions,
            path_costs=lengths_np.astype(np.int64),
            num_generated=np.asarray(state.num_generated).astype(np.int64),
            search_iters=iters,
            time_s=time.time() - t0,
            pool_dropped=np.asarray(state.pool_dropped),
            tbl_overflow=np.asarray(state.tbl_overflow),
            finish_iters=np.asarray(state.finish_iters),
        )

    def solve_stream(self, roots: np.ndarray, instances: int,
                     weights: Optional[np.ndarray] = None,
                     max_iters_per: int = 100_000,
                     check_every: int = 8,
                     verbose: bool = False,
                     log=print,
                     on_result=None) -> SolveResult:
        """Replace-on-finish streaming solve of N roots through I persistent
        instance slots.

        A lockstep `solve` batch runs until its LAST instance terminates —
        finished slots idle (round 1 measured ~4.6x between kernel and
        end-to-end throughput, largely this straggler waste). Here a slot
        that terminates (or exceeds `max_iters_per` steps) is harvested and
        immediately re-seeded with the next pending root by the jitted
        masked reset — no recompile, no idle slots, and per-state times are
        true wall-clock assignment->completion measurements.

        `on_result(root_idx, solution, time_s, nodes, iters)` fires as each
        state completes. Returns a SolveResult over all N roots in input
        order.
        """
        cfg = self.cfg
        roots_np = np.asarray(roots)
        n = roots_np.shape[0]
        i_slots = min(instances, n)
        if weights is None:
            weights_np = np.full((n,), cfg.weight, np.float32)
        else:
            weights_np = np.asarray(weights, np.float32)

        t_start = time.time()
        state = astar_init(self.env, cfg, jnp.asarray(roots_np[:i_slots]),
                           jnp.asarray(weights_np[:i_slots]))
        state = self._shard_state(state)
        if self._inst_sharding is not None:
            self.params = jax.device_put(self.params, self._repl_sharding)
            self.batch_stats = jax.device_put(self.batch_stats,
                                              self._repl_sharding)

        slot_root = np.arange(i_slots)          # root index per slot, -1 idle
        t_assign = np.full(i_slots, t_start)
        next_idx = i_slots
        completed = 0
        solutions: List[Optional[List[int]]] = [None] * n
        times = np.zeros(n)
        num_generated = np.zeros(n, np.int64)
        fin_iters = np.zeros(n, np.int32)
        pool_dropped = np.zeros(n, np.int32)
        tbl_overflow = np.zeros(n, np.int32)
        total_iters = 0

        while completed < n:
            state = self._steps(state, check_every)
            total_iters += check_every
            done = np.asarray(state.done)
            # blocking read above = no device work in flight: safe point
            # for the cooperative bench pause (utils/quiesce.py)
            check_quiesce()
            fi = np.asarray(state.finish_iters)
            active = slot_root >= 0
            finish = active & (done | (fi >= max_iters_per))
            if not finish.any():
                continue

            acts, lengths = self._extract(state)
            acts_np = np.asarray(acts)
            goal_found = np.asarray(state.goal_id) >= 0
            gen = np.asarray(state.num_generated)
            pdrop = np.asarray(state.pool_dropped)
            tovf = np.asarray(state.tbl_overflow)
            now = time.time()

            mask = np.zeros(i_slots, bool)
            park = np.zeros(i_slots, bool)
            new_roots = np.zeros((i_slots, roots_np.shape[1]),
                                 roots_np.dtype)
            new_w = np.full(i_slots, cfg.weight, np.float32)
            for slot in np.nonzero(finish)[0]:
                ridx = int(slot_root[slot])
                soln = None
                if done[slot] and goal_found[slot]:
                    soln = [int(x) for x in acts_np[slot] if x >= 0][::-1]
                solutions[ridx] = soln
                times[ridx] = now - t_assign[slot]
                num_generated[ridx] = int(gen[slot])
                fin_iters[ridx] = int(fi[slot])
                pool_dropped[ridx] = int(pdrop[slot])
                tbl_overflow[ridx] = int(tovf[slot])
                completed += 1
                if on_result is not None:
                    on_result(ridx, soln, times[ridx], int(gen[slot]),
                              int(fi[slot]))
                if next_idx < n:
                    mask[slot] = True
                    new_roots[slot] = roots_np[next_idx]
                    new_w[slot] = weights_np[next_idx]
                    slot_root[slot] = next_idx
                    t_assign[slot] = now
                    next_idx += 1
                else:
                    # no work left: park the slot (done=True via the reset's
                    # park mask) so it stops popping during the final drain.
                    slot_root[slot] = -1
                    park[slot] = True

            if mask.any() or park.any():
                m = jnp.asarray(mask)
                r = jnp.asarray(new_roots)
                w_ = jnp.asarray(new_w)
                pk = jnp.asarray(park)
                if self._inst_sharding is not None:
                    m = jax.device_put(m, self._inst_sharding)
                    r = jax.device_put(r, self._inst_sharding)
                    w_ = jax.device_put(w_, self._inst_sharding)
                    pk = jax.device_put(pk, self._inst_sharding)
                state = self._reset(state, m, r, w_, pk)
            if verbose:
                log(f"stream: {completed}/{n} done, itr {total_iters}, "
                    f"in-flight {int((slot_root >= 0).sum())}, "
                    f"dropped {int(np.asarray(state.pool_dropped).max()):,}, "
                    f"tbl_ovf {int(np.asarray(state.tbl_overflow).max()):,}")

        return SolveResult(
            solutions=solutions,
            path_costs=np.array([len(s) if s is not None else -1
                                 for s in solutions], np.int64),
            num_generated=num_generated,
            search_iters=total_iters,
            time_s=time.time() - t_start,
            pool_dropped=pool_dropped,
            tbl_overflow=tbl_overflow,
            finish_iters=fin_iters,
        )
