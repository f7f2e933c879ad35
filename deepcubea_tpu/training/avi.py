"""Deep Approximate Value Iteration (DAVI), device-resident and streaming.

The reference's AVI round trip (ctg_approx/avi.py:176-257) is:
  spawn per-GPU heuristic server processes on the frozen TARGET net ->
  30-50 worker processes generate 50M scrambled states and label them with
  one-step Bellman backups through queue RPC (updaters/updater.py) ->
  train the CURRENT net over the materialized dataset (nnet_utils.py:53-118)
  -> eval with GBFS -> if loss < thresh, copy current/ over target/.

On TPU all of that is ONE jitted program per training iteration: scramble
generation (lax.scan), child expansion, target-net Bellman labeling and the
Adam step fuse on-device; the heuristic "service", the worker pool, the
queues and the file-copy parameter server disappear. Labels stream — each
iteration generates and labels its own fresh batch with the same frozen
target, which is the same fixed-point iteration with strictly fresher data
(the reference reuses each 50M-state set for ~one epoch, avi.py:227).

Semantics preserved from the reference:
  - labels y = min_a(tc + max(h_target(child), 0)) * (1 - solved(state))
    (search_utils.py:16-32; clip_zero=True serving, avi.py:209-215)
  - all-zero target before the first target swap (avi.py:207-208)
  - k-step GBFS exploration labeling every visited state, with
    k = min(update_num + 1, max_update_steps) and the state budget divided
    by k (avi.py:131-132, updater.py:11-33)
  - lr schedule lr * lr_d^itr by GLOBAL iteration (nnet_utils.py:74-76)
  - fresh Adam state per update phase (nnet_utils.py:58)
  - itrs per update = epochs_per_update * ceil(states_per_update /
    batch_size) (avi.py:227)
  - target swap gated on last training loss < loss_thresh (avi.py:250-255)
  - GBFS eval after every update with max_solve_steps = min(update_num + 1,
    back_max) (avi.py:240-242)
"""

from __future__ import annotations

import dataclasses
import math
import time
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs.base import Environment
from ..utils.quiesce import check_quiesce
from ..models.resnet import (ResnetValueNet, build_model, forward_train,
                             init_variables)
from .astar_explore import astar_explore
from .gbfs import bellman_backup, gbfs_run, gbfs_test
from .heuristic import heuristic_values
from .scramble_pool import ScramblePool


@dataclasses.dataclass(frozen=True)
class AVIConfig:
    """Training hyperparameters (defaults = reference argparse defaults,
    ctg_approx/avi.py:21-118)."""
    back_max: int
    batch_size: int = 1000
    lr: float = 1e-3
    lr_d: float = 0.9999993
    max_itrs: int = 1_000_000
    loss_thresh: float = 0.05
    states_per_update: int = 1000
    epochs_per_update: int = 1
    max_update_steps: int = 1
    update_method: str = "gbfs"
    eps_max: float = 0.0
    num_test: int = 1000
    log_every: int = 100
    # Automated version of the reference's documented manual promotion
    # (train.sh:5 "cp -r current/* target/  # manually update target
    # network"): when the loss gate has not fired and the loss has not
    # improved for this many consecutive update phases, promote anyway.
    # 0 disables (exact reference gate semantics).
    plateau_promote: int = 0
    # Persistent mixing-chain scramble pool (training/scramble_pool.py):
    # -1 = auto (on, auto-sized, for envs using the default goal-walk
    # generator), 0 = off (fresh back_max-scan per iteration, the exact
    # reference walk per batch), >0 = explicit chain count.
    scramble_pool: int = -1
    # Label grouping for explorer updates (num_steps > 1): explore this
    # many iterations' worth of roots in ONE batched explorer call, then
    # train on per-iteration slices. Identical data and ordering — the
    # explorer NN batch grows from n_gen*A rows (e.g. 245 for lightsout7,
    # an MXU-starving matmul) to group*n_gen*A. 0 = auto (~1024 roots per
    # call), 1 = off.
    label_group: int = 0
    # Double-Q labeling (training/gbfs.py bellman_backup docstring): select
    # the backup's argmin child with the CURRENT net, evaluate it with the
    # frozen target. Removes the min-over-A-children selection bias that
    # freezes value iteration at a false fixed point below the true cost
    # when prediction noise * E[min of A draws] cancels the +1 edge cost
    # (the round-2 lightsout7 stall; A=49 there). Off = exact reference
    # estimator (plain min, search_utils.py:16-32).
    double_q: bool = False
    # GBFS explorer seen-set window (reference: unbounded per-trajectory
    # set, gbfs.py:114-118). The ring-size study (docs/RESULTS.md) shows
    # labels within ~5% across rings 2-64 and FASTER solves with small
    # rings (a large ring forces random restarts near the goal, where
    # states recur); 8 is the validated default.
    seen_ring: int = 8


class TrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: tuple
    itr: jnp.ndarray  # () int32 global iteration


def _adam():
    # torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8), matching the
    # reference (nnet_utils.py:58); lr is applied manually per step so the
    # global-iteration decay survives per-update optimizer resets.
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def make_train_chunk(env: Environment, model: ResnetValueNet, cfg: AVIConfig,
                     num_steps: int, all_zeros: bool, chunk_len: int,
                     mesh=None, pool: Optional[ScramblePool] = None):
    """A jitted scan of `chunk_len` streaming AVI iterations.

    Each iteration: generate fresh scrambles -> label with the frozen target
    (Bellman backup, or the k-step GBFS explorer for num_steps > 1) -> one
    Adam step on the current net. Returns (new_state, per-iter losses).

    With `mesh`, the batch axis is sharded over the "data" mesh axis and
    parameters follow `parallel.mesh.param_shardings` (data parallel +
    optional fc1 tensor parallelism); XLA inserts the gradient psum and
    activation collectives. This subsumes the reference's DataParallel +
    worker-process fan-out (SURVEY.md §2.3).
    """
    tx = _adam()
    n_gen = max(1, math.ceil(cfg.batch_size / num_steps))

    # label grouping (explorer updates only): one explorer call labels
    # `group` iterations' worth of roots so its per-step NN batch is
    # group*n_gen*A rows instead of n_gen*A; group must divide chunk_len
    def _auto_group(target_roots):
        g0 = cfg.label_group if cfg.label_group > 0 else max(
            1, target_roots // n_gen)
        g0 = max(1, min(g0, chunk_len))
        return next(d for d in range(g0, 0, -1) if chunk_len % d == 0)

    if num_steps > 1:
        group = _auto_group(4096 if pool is None else 1024)
        gen_group = 1
    else:
        group = 1
        # envs without a scramble pool (sokoban's hindsight generator runs
        # an up-to-(100+back_max)-step scan per call) amortize generation
        # across iterations: one call makes gen_group iterations' worth of
        # roots, train steps consume per-iteration slices (labels are still
        # per-slice through the same frozen target — identical data)
        gen_group = 1 if (pool is not None or cfg.label_group == 1) \
            else _auto_group(16384)

    def constrain_batch(x):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def sample_states(pool_st, key, count):
        if pool is not None:
            pool_st, states, _ = pool.advance_and_sample(pool_st, key, count)
            pool_st = jax.tree_util.tree_map(constrain_batch, pool_st)
        else:
            states, _ = env.generate_scrambles(key, count, cfg.back_max)
        return pool_st, constrain_batch(states)

    def train_step(state: TrainState, batch):
        xs, y, weights = batch
        xs = constrain_batch(xs)

        def loss_fn(params):
            out, new_stats = forward_train(model, params, state.batch_stats,
                                           env.encode(xs))
            err = (out - y) ** 2
            loss = jnp.sum(err * weights) / jnp.maximum(jnp.sum(weights), 1.0)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        lr = cfg.lr * cfg.lr_d ** state.itr.astype(jnp.float32)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt, state.itr + 1), loss

    def one_iter(carry, target, key):
        # num_steps == 1: one-step Bellman labels, full-batch matmuls;
        # gen_group iterations' worth of roots from one generator call
        state, pool_st = carry
        target_params, target_stats = target
        k_gen, _ = jax.random.split(key)
        pool_st, states = sample_states(pool_st, k_gen, gen_group * n_gen)
        states_g = states.reshape(gen_group, n_gen, env.state_width)

        def tstep(st, xs):
            if all_zeros:
                # pre-first-target labels: h == 0 (nnet_utils.py:271-272)
                solved = env.is_solved(xs)
                y = 1.0 - solved.astype(jnp.float32)
            else:
                sel = ((st.params, st.batch_stats) if cfg.double_q
                       else (None, None))
                y, _, _ = bellman_backup(env, model, target_params,
                                         target_stats, xs, clip_zero=True,
                                         sel_params=sel[0], sel_stats=sel[1])
            return train_step(st, (xs, y, jnp.ones((n_gen,), jnp.float32)))

        state, losses = jax.lax.scan(tstep, state, states_g)
        return (state, pool_st), losses  # (gen_group,)

    def super_iter(carry, target, key):
        # num_steps > 1: explore group*n_gen roots at once, then `group`
        # train steps over a globally shuffled view of the call's whole
        # label pool (reference make_batches, nnet_utils.py:30-48, shuffles
        # the full update's data before batching; without the shuffle each
        # gradient step would see only n_gen roots' correlated trajectories
        # — 5 roots/batch at num_steps=200)
        state, pool_st = carry
        target_params, target_stats = target
        k_gen, k_run, k_shuf = jax.random.split(key, 3)
        nb = group * n_gen
        pool_st, states = sample_states(pool_st, k_gen, nb)

        sel = ((state.params, state.batch_stats) if cfg.double_q
               else (None, None))
        if cfg.update_method.lower() == "astar":
            # per-instance random weight (updater.py:37)
            w_rand = jax.random.uniform(k_run, (nb,))
            res = astar_explore(env, model, target_params, target_stats,
                                states, w_rand, num_steps,
                                sel_params=sel[0], sel_stats=sel[1])
        else:
            k_eps, k_gbfs = jax.random.split(k_run)
            eps = jax.random.uniform(k_eps, (nb,)) * cfg.eps_max
            res = gbfs_run(env, model, target_params, target_stats, states,
                           eps, k_gbfs, num_steps, seen_ring=cfg.seen_ring,
                           sel_params=sel[0], sel_stats=sel[1])

        k_, w_ = num_steps, env.state_width
        n_lab = k_ * nb
        perm = jax.random.permutation(k_shuf, n_lab)
        xs = res.traj_states.reshape(n_lab, w_)[perm].reshape(
            group, k_ * n_gen, w_)
        y = res.traj_ctg.reshape(n_lab)[perm].reshape(group, k_ * n_gen)
        wt = res.traj_valid.reshape(n_lab)[perm].reshape(
            group, k_ * n_gen).astype(jnp.float32)
        state, losses = jax.lax.scan(train_step, state, (xs, y, wt))
        return (state, pool_st), losses  # (group,)

    @partial(jax.jit, donate_argnums=(0, 1))
    def chunk(state: TrainState, pool_st, target_params, target_stats, key):
        target = (target_params, target_stats)
        if num_steps == 1:
            keys = jax.random.split(key, chunk_len // gen_group)
            carry, losses = jax.lax.scan(lambda c, k: one_iter(c, target, k),
                                         (state, pool_st), keys)
        else:
            keys = jax.random.split(key, chunk_len // group)
            carry, losses = jax.lax.scan(
                lambda c, k: super_iter(c, target, k), (state, pool_st), keys)
        return carry, losses.reshape(chunk_len)

    return chunk


class AVITrainer:
    """Host-side orchestration of update phases, eval, checkpoints and the
    target swap. The per-iteration work is entirely on device."""

    def __init__(self, env: Environment, cfg: AVIConfig,
                 seed: int = 0, model: Optional[ResnetValueNet] = None,
                 log=print, mesh=None):
        """With `mesh`, every update phase runs data-parallel (and
        optionally fc1-tensor-parallel) over it: parameters and optimizer
        state follow `parallel.mesh.param_shardings`, the batch axis shards
        over "data" inside the jitted chunk. This is the CLI-reachable
        replacement for the reference's DataParallel + 30-process updater
        pool (SURVEY.md §2.3)."""
        self.env = env
        self.cfg = cfg
        self.log = log
        self.model = model or build_model(env.nnet_config)
        self.key = jax.random.PRNGKey(seed)
        self.mesh = mesh

        self.key, k_init = jax.random.split(self.key)
        example = env.encode(self._example_states())
        params, batch_stats = init_variables(self.model, k_init, example)
        state = TrainState(params, batch_stats, _adam().init(params),
                           jnp.zeros((), jnp.int32))
        self.state = self._shard_state(state)
        self.target_params = None
        self.target_stats = None
        self.update_num = 0
        self._chunk_cache = {}
        self.last_loss = float("inf")
        self.last_swapped = False
        self.last_eval = None
        self._deep_band_hist: list = []
        self._best_loss_since_swap = float("inf")
        self._stall_count = 0

        # mixing-chain scramble pool: the generic goal-walk pool
        # (training/scramble_pool.py) for default-generator envs, or the
        # env's own pool (e.g. sokoban's two-stage hindsight pool,
        # envs/sokoban.py) when it provides make_scramble_pool
        self.pool = None
        self.pool_state = None
        uses_default_gen = (type(env).generate_scrambles
                            is Environment.generate_scrambles)
        custom_pool = getattr(env, "make_scramble_pool", None)
        if cfg.scramble_pool != 0 and (uses_default_gen or custom_pool):
            if cfg.scramble_pool > 0:
                chains = cfg.scramble_pool
            else:
                chains = ScramblePool.auto_chains(cfg.batch_size, cfg.back_max)
            if mesh is not None:
                # chain count must divide over the data axis; a multiple of
                # (back_max+1)*data keeps the depth tiling exactly uniform
                data = mesh.devices.shape[list(mesh.axis_names).index("data")]
                period = (cfg.back_max + 1) * data
                chains = math.ceil(chains / period) * period
            self.pool = (custom_pool(cfg.back_max, chains) if custom_pool
                         else ScramblePool(env, cfg.back_max, chains))

    def _shard_state(self, state: TrainState) -> TrainState:
        if self.mesh is None:
            return state
        from ..parallel.mesh import param_shardings, replicated
        return TrainState(
            params=jax.device_put(state.params,
                                  param_shardings(self.mesh, state.params)),
            batch_stats=jax.device_put(
                state.batch_stats,
                param_shardings(self.mesh, state.batch_stats)),
            opt_state=jax.device_put(
                state.opt_state,
                param_shardings(self.mesh, state.opt_state)),
            itr=jax.device_put(state.itr, replicated(self.mesh)))

    def _example_states(self):
        if hasattr(self.env, "goal_states"):
            try:
                return self.env.goal_states(2)
            except NotImplementedError:
                pass
        s, _ = self.env.generate_scrambles(jax.random.PRNGKey(0), 2, 1)
        return s

    # ------------------------------------------------------------------ #

    @property
    def itr(self) -> int:
        return int(self.state.itr)

    def _get_chunk(self, num_steps: int, all_zeros: bool, chunk_len: int):
        key = (num_steps, all_zeros, chunk_len)
        if key not in self._chunk_cache:
            self._chunk_cache[key] = make_train_chunk(
                self.env, self.model, self.cfg, num_steps, all_zeros,
                chunk_len, mesh=self.mesh, pool=self.pool)
        return self._chunk_cache[key]

    def _ensure_pool(self):
        if self.pool is None or self.pool_state is not None:
            return
        self.key, k = jax.random.split(self.key)
        t0 = time.time()
        self.pool_state = jax.jit(self.pool.init)(k)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.pool_state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(
                    self.mesh, P("data", *([None] * (x.ndim - 1))))),
                self.pool_state)
        jax.block_until_ready(self.pool_state[0])
        self.log(f"scramble pool: {self.pool.num_chains} chains warmed in "
                 f"{time.time() - t0:.1f}s")

    def run_update(self) -> float:
        """One AVI update phase; returns the final training loss."""
        cfg = self.cfg
        all_zeros = self.target_params is None
        num_steps = min(self.update_num + 1, cfg.max_update_steps)
        if num_steps > 4:
            # bucket explorer depth to multiples of 4: the reference grows
            # it by 1 per update (avi.py:240-242 via updater), which under
            # jit would recompile the fused chunk at every update (200
            # compiles for lightsout7, train.sh:68). Rounding UP (by at
            # most 3) only deepens exploration and stays within a few
            # steps of the reference curriculum; labels stay correct, and
            # the persistent compilation cache absorbs the <= 50 bucket
            # compiles once per configuration.
            num_steps = min((num_steps + 3) & ~3, cfg.max_update_steps)
        itrs = int(cfg.epochs_per_update *
                   math.ceil(cfg.states_per_update / cfg.batch_size))
        self.log(f"Update {self.update_num}: {itrs} iterations, "
                 f"explore_steps={num_steps}, all_zeros={all_zeros}")

        # fresh optimizer per update (reference nnet_utils.py:58)
        self.state = self.state._replace(opt_state=_adam().init(self.state.params))

        if all_zeros:
            # dummy (unused in all-zeros labeling) — copied so it does not
            # alias the donated train state
            copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
            target = (copy(self.state.params), copy(self.state.batch_stats))
        else:
            target = (self.target_params, self.target_stats)

        self._ensure_pool()
        done = 0
        t0 = time.time()
        last_loss = float("nan")
        while done < itrs:
            chunk_len = min(cfg.log_every, itrs - done)
            chunk = self._get_chunk(num_steps, all_zeros, chunk_len)
            self.key, k = jax.random.split(self.key)
            (self.state, self.pool_state), losses = chunk(
                self.state, self.pool_state, *target, k)
            done += chunk_len
            last_loss = float(losses[-1])
            # blocking read above = no device work in flight: safe point
            # for the cooperative bench pause (utils/quiesce.py)
            check_quiesce()
            dt = time.time() - t0
            states_s = done * cfg.batch_size / max(dt, 1e-9)
            self.log(f"Itr: {self.itr}, loss: {float(losses.mean()):.5f} "
                     f"(last {last_loss:.5f}), lr: "
                     f"{cfg.lr * cfg.lr_d ** self.itr:.2E}, "
                     f"states/s: {states_s:,.0f}")
        self.last_loss = last_loss
        return last_loss

    def _swap_target(self) -> None:
        # materialize fresh buffers: the train state is donated to the
        # jitted chunk, so the target must not alias it
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
        self.target_params = copy(self.state.params)
        self.target_stats = copy(self.state.batch_stats)
        self.update_num += 1
        self.last_swapped = True

    def maybe_swap_target(self) -> bool:
        """Target swap = rebinding a pytree of device arrays (vs. the
        reference's directory copy, avi.py:121-126, 250-255).

        With cfg.plateau_promote > 0 a stalled loss gate additionally
        triggers a promotion — the automated equivalent of the reference's
        documented manual current->target copy (train.sh:5), applied when
        the loss plateaus above loss_thresh for that many updates."""
        self.last_swapped = False
        if self.last_loss < self.cfg.loss_thresh:
            self.log("Updating target network")
            self._swap_target()
        elif self.cfg.plateau_promote > 0:
            improved = self.last_loss < self._best_loss_since_swap * 0.995
            if improved:
                self._stall_count = 0
            else:
                self._stall_count += 1
            self._best_loss_since_swap = min(self._best_loss_since_swap,
                                             self.last_loss)
            if self._stall_count >= self.cfg.plateau_promote:
                self.log(f"Updating target network (plateau promotion after "
                         f"{self._stall_count} stalled updates at loss "
                         f"{self.last_loss:.5f})")
                self._swap_target()
        if self.last_swapped:
            self._best_loss_since_swap = float("inf")
            self._stall_count = 0
        return self.last_swapped

    def load_deep_band_history(self, metrics_path: str) -> int:
        """Rebuild the deep-band %solved series from a metrics.jsonl written
        by cli.train. Without this every restart resets the history, so the
        [STALLED] detector cannot fire until 7 fresh evals accumulate and
        best-before deltas compare against post-restart values — masking
        exactly the plateau the feature exists to catch (ADVICE r3)."""
        import json as _json
        hist = []
        cur_itr = int(self.itr)
        try:
            with open(metrics_path) as f:
                for line in f:
                    # Each line is independently best-effort: a malformed
                    # record (non-dict JSON, non-numeric depth key, missing
                    # per_solved) is skipped, never fatal to resume
                    # (ADVICE r4). Records logged past the checkpoint being
                    # resumed (crash between metric write and save, or
                    # resuming an older checkpoint) are dropped so the
                    # rebuilt history matches the resumed trainer state.
                    try:
                        rec = _json.loads(line)
                        ev = rec.get("eval")
                        if not ev:
                            continue
                        if int(rec.get("itr", 0)) > cur_itr:
                            continue
                        depths = sorted(int(d) for d in ev)
                        deep = [d for d in depths if d >= depths[-1] * 2 // 3]
                        hist.append(float(np.mean(
                            [ev[str(d)]["per_solved"] for d in deep])))
                    except (ValueError, KeyError, TypeError, AttributeError):
                        continue
        except OSError:
            return 0
        self._deep_band_hist = hist
        return len(hist)

    def evaluate(self) -> dict:
        self.key, k = jax.random.split(self.key)
        max_steps = min(self.update_num + 1, self.cfg.back_max)
        t0 = time.time()
        stats = gbfs_test(self.env, self.model, self.state.params,
                          self.state.batch_stats, self.cfg.num_test,
                          self.cfg.back_max, k, max_solve_steps=max_steps,
                          log=self.log)
        if hasattr(self.env, "optimal_costs"):
            # Exact-oracle probe (envs that can certify optimal costs, e.g.
            # LightsOut's GF(2) solve): fixed probe set so the accuracy
            # curve is comparable update-to-update. Catches a value-function
            # stall (round-2 lightsout7 defect) within a few updates instead
            # of at end-of-training solve time.
            probe, _ = self.env.generate_scrambles(
                jax.random.PRNGKey(0xD1A6), 512, self.cfg.back_max,
                depths=jnp.full((512,), self.cfg.back_max, jnp.int32))
            h = np.asarray(heuristic_values(
                self.env, self.model, self.state.params,
                self.state.batch_stats, probe, clip_zero=True))
            opt = np.asarray(self.env.optimal_costs(probe))
            m = opt >= 0
            corr = float(np.corrcoef(h[m], opt[m])[0, 1]) if m.sum() > 1 else 0.0
            self.log(f"Oracle: pred {h[m].mean():.2f} vs optimal "
                     f"{opt[m].mean():.2f}, MAD {np.abs(h[m] - opt[m]).mean():.2f}, "
                     f"corr {corr:.3f} (depth-{self.cfg.back_max} probe)")
        # deep-band trend: mean %solved over the deepest third of the
        # scramble-depth buckets, tracked across evals. A value function
        # can plateau invisibly behind a noisy loss (round-2 puzzle35 /
        # lightsout7); this prints the actionable signal inline instead of
        # leaving it to post-hoc scripts/trend_gbfs.py.
        depths = sorted(stats.keys())
        deep = [d for d in depths if d >= depths[-1] * 2 // 3]
        db = float(np.mean([stats[d]["per_solved"] for d in deep]))
        self._deep_band_hist.append(db)
        hist = self._deep_band_hist
        if len(hist) > 6:
            delta = max(hist[-3:]) - max(hist[:-3])
            tag = " [STALLED]" if delta <= 0.5 and max(hist[:-3]) < 99.5 \
                else ""
            self.log(f"Deep-band (>= {deep[0]} back-steps) solved: "
                     f"{db:.1f}% (best-before {max(hist[:-3]):.1f}%, "
                     f"recent-max delta {delta:+.1f}pp){tag}")
        self.log(f"Test time: {time.time() - t0:.2f}")
        # eval is the longest stretch between run_update's per-chunk safe
        # points (several multi-second dispatches, worse when the chip is
        # time-sliced) — give the cooperative bench pause a safe point here
        check_quiesce()
        return stats

    def train(self, max_itrs: Optional[int] = None,
              on_update_end=None) -> None:
        max_itrs = max_itrs if max_itrs is not None else self.cfg.max_itrs
        while self.itr < max_itrs:
            loss = self.run_update()
            self.last_eval = self.evaluate()
            self.log(f"Last loss was {loss:f}")
            self.maybe_swap_target()
            if on_update_end is not None:
                on_update_end(self)
        self.log("Done")
