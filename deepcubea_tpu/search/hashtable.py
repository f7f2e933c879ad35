"""Device-resident open-addressing hash table for the A* closed set.

Replaces the reference's host hash containers — the Python
`closed_dict: Dict[State, path_cost]` with reopen-if-cheaper
(search_methods/astar.py:55, 78-90) and the C++ `unordered_set` over raw
state bytes (cpp/parallel_weighted_astar.cpp:104-111, 243-265) — with a
fixed-capacity double-hashed table of two 32-bit state fingerprints plus the
best known path cost, living entirely in HBM and updated by batched scatters
inside the jitted search step.

Keys are (fp0, fp1) uint32 pairs from `envs.base.fingerprint` (~2^-64
pairwise collision odds; TPUs run x32 so a single 64-bit key is out).
fp0 == 0 is reserved as the empty-slot marker; real keys with fp0 == 0 are
remapped to fp0 = 1 (halves nothing in practice: fp1 still disambiguates).

Design: ONE-SHOT multi-probe. All `max_probes` candidate slots per key are
computed up front (double hashing: step = fp1 | 1 is odd, so the sequence
covers the power-of-2 table) and their fp0 words fetched in a single fused
gather — the only table-sized random read. Each key selects its first
match-or-empty probe; empties contend through a persistent claim array
(scatter batch index, gather back, only the winner writes), and one verify
gather afterwards settles everyone: winners, pre-existing matches, and
intra-batch duplicate-key losers (whose slot the winner just filled, turning
them into matches). Keys still unresolved — contention losses to a foreign
key, or all probes foreign-occupied — are accepted WITHOUT insertion (they
may be re-expanded later; correctness is unaffected) and counted in the
overflow statistic.

A sequential probe loop (the textbook formulation) costs max_probes
dependent table-sized gathers per call; the one-shot form replaces them
with one. Measured on TPU v5e at 45% load, batch 120k into an 8M table:
~0.1 ms/insert call vs ~108 ms for the loop.

All functions are single-instance; the search layer vmaps them over the
instance axis.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

INF_G = jnp.int32(0x7FFFFFFF)


class HashTable(NamedTuple):
    fp0: jnp.ndarray    # (H,) uint32, 0 = empty slot
    fp1: jnp.ndarray    # (H,) uint32
    g: jnp.ndarray      # (H,) int32 best known path cost
    claim: jnp.ndarray  # (H,) int32 contention scratch (never read stale)


def ht_new(capacity: int) -> HashTable:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of 2"
    return HashTable(
        fp0=jnp.zeros((capacity,), jnp.uint32),
        fp1=jnp.zeros((capacity,), jnp.uint32),
        g=jnp.full((capacity,), INF_G, jnp.int32),
        claim=jnp.zeros((capacity,), jnp.int32),
    )


def _remap_empty(fp0: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(fp0 == 0, jnp.uint32(1), fp0)


def _probe_slots(fp0: jnp.ndarray, fp1: jnp.ndarray, num_probes: int,
                 mask: int, base=None) -> jnp.ndarray:
    """(N, P) int32 candidate slots per key under double hashing.

    With `base` (per-key int32 offsets), slots address a FLAT concatenation
    of per-instance tables: probe within the instance's power-of-2 region
    (mask = per-instance capacity - 1), then shift by the region offset.
    This is how the search layer batches I instances' probes into ONE
    gather instead of I vmapped chains (round-4 instance-axis fix)."""
    step = fp1 | jnp.uint32(1)
    k = jnp.arange(num_probes, dtype=jnp.uint32)[None, :]
    slots = ((fp0[:, None] + k * step[:, None])
             & jnp.uint32(mask)).astype(jnp.int32)
    if base is not None:
        slots = slots + base[:, None]
    return slots


def ht_insert(tbl: HashTable, fp0: jnp.ndarray, fp1: jnp.ndarray,
              g: jnp.ndarray, valid: jnp.ndarray, max_probes: int = 16,
              passes: int = 3, base=None,
              inst_capacity: int = 0) -> Tuple[HashTable, jnp.ndarray,
                                               jnp.ndarray]:
    """Insert a batch of keys with costs; returns (table, accept, overflow).

    accept[i] is True iff entry i is new or strictly cheaper than the
    table's best known cost for its key (the reopen rule of
    astar.py:78-90 / cpp:243-265). overflow is a per-key bool array marking
    entries accepted without insertion (contention loss / probe
    exhaustion); callers reduce it (sum, or per-instance reshape+sum in
    flat mode) — one return type for every mode.

    Each pass is one-shot for every still-pending key; a pass loses only
    same-round contention to a *foreign* key at the same empty slot, so the
    pending count shrinks ~quadratically (birthday bound N^2/2H; 120k keys
    into an 8M table leave ~900). Passes after the first therefore run at a
    COMPACTED width n/8 (top_k selects the pending keys — ~0.1 ms on TPU,
    vs ~1-2 ms for every 120k-element random gather/scatter the full-width
    passes used to issue; the insert was ~60% of the production A* step).
    Pending keys beyond the compacted width — impossible short of a
    pathological load factor — become overflow-accepts, which are safe.

    Flat multi-instance mode (`base` + `inst_capacity`): the table arrays
    are the concatenation of I per-instance tables of `inst_capacity`
    slots and base[k] = instance(k) * inst_capacity. Probing stays inside
    each key's instance region, so semantics are identical to vmapping the
    single-instance form — but every gather/scatter is one flat op over
    all instances. The compaction width formula is invariant: summed
    per-instance pending I*(n/I)^2/(2*h_inst) equals n^2/(2*H_total).
    """
    t_fp0, t_fp1, t_g, claim = tbl
    h = t_fp0.shape[0]
    n = fp0.shape[0]
    fp0 = _remap_empty(fp0)
    probe_mask = (inst_capacity - 1) if base is not None else (h - 1)

    def one_pass(t_fp0, t_fp1, t_g, claim, kfp0, kfp1, kg, pending,
                 kbase=None):
        """One one-shot contention round for keys (kfp0,kfp1,kg); returns
        updated table arrays + per-key (resolved, accepted) masks."""
        m = kfp0.shape[0]
        idx = jnp.arange(m, dtype=jnp.int32)
        slots = _probe_slots(kfp0, kfp1, max_probes, probe_mask,
                             kbase)                          # (M, P)
        t0 = t_fp0[slots]                                    # one big gather
        stop = (t0 == kfp0[:, None]) | (t0 == 0)
        has = jnp.any(stop, axis=1)
        first = jnp.argmax(stop, axis=1)
        sel = jnp.take_along_axis(slots, first[:, None], axis=1)[:, 0]
        t0_at = jnp.take_along_axis(t0, first[:, None], axis=1)[:, 0]
        is_empty = pending & has & (t0_at == 0)

        # contend for empty slots; gather-back verifies the single winner.
        # Stale claim values (earlier passes/calls, or a slot reset) are
        # harmless: every contender scatters before anyone reads, so a
        # contested slot always holds one of this round's indices.
        claim = claim.at[jnp.where(is_empty, sel, h)].set(idx, mode="drop")
        won = is_empty & (claim[sel] == idx)
        ws = jnp.where(won, sel, h)
        t_fp0 = t_fp0.at[ws].set(kfp0, mode="drop")
        t_fp1 = t_fp1.at[ws].set(kfp1, mode="drop")
        t_g = t_g.at[ws].set(kg, mode="drop")

        # one verify pass settles match path, winners, and duplicate-key
        # losers (the winner just filled their slot, turning them into
        # matches). A foreign key with an equal fp0 but different fp1
        # earlier in the probe chain fails this check and stays pending —
        # and since every pass re-selects the same first-fp0-match slot,
        # such a key can NEVER resolve: it is a repeat overflow-accept by
        # design (probability ~2^-32 per occupied probe slot; accepting
        # without insertion only permits re-expansion, which is safe).
        # Making the stop predicate (fp0, fp1)-exact would double the
        # dominant fused-gather cost for that 2^-32 event — not worth it.
        v0, v1, vg = t_fp0[sel], t_fp1[sel], t_g[sel]
        now_match = pending & has & (v0 == kfp0) & (v1 == kfp1)
        cheaper = now_match & (kg < vg)
        t_g = t_g.at[jnp.where(cheaper, sel, h)].min(kg, mode="drop")
        return (t_fp0, t_fp1, t_g, claim,
                won | now_match, won | cheaper)

    t_fp0, t_fp1, t_g, claim, resolved, accepted = one_pass(
        t_fp0, t_fp1, t_g, claim, fp0, fp1, g, valid, base)
    accept = accepted
    done = ~valid | resolved

    if passes > 1 and n > 1:
        # compact the ~quadratically-shrunk pending set and finish it at
        # width m: one cheap top_k + m-sized gathers replace full-width
        # random ops in every later pass. Expected pending after pass 1 is
        # ~N^2/(2*empty); sizing m at 8*N^2/H covers loads up to 75% with a
        # 4x margin (n=120k, H=8M -> m~14k ~ n/8). Beyond m: overflow-accept.
        m = min(n, max(128, 8 * n * n // h))
        pending = valid & ~done
        _, pidx = jax.lax.top_k(pending.astype(jnp.int32), m)
        cvalid = pending[pidx]
        cfp0, cfp1, cg = fp0[pidx], fp1[pidx], g[pidx]
        cbase = base[pidx] if base is not None else None
        cdone = ~cvalid
        caccept = jnp.zeros((m,), bool)
        for _ in range(passes - 1):
            t_fp0, t_fp1, t_g, claim, resolved, accepted = one_pass(
                t_fp0, t_fp1, t_g, claim, cfp0, cfp1, cg, ~cdone, cbase)
            caccept = caccept | accepted
            cdone = cdone | resolved
        # scatter the compacted outcomes back to full width
        safe = jnp.where(cvalid, pidx, n)
        accept = accept | jnp.zeros((n,), bool).at[safe].set(
            caccept, mode="drop")
        done = done | jnp.zeros((n,), bool).at[safe].set(
            cdone & cvalid, mode="drop")

    # still pending: accepted without insertion (safe; counts as overflow).
    # Always returned as the per-key bool array regardless of mode —
    # callers reduce (sum) as needed. A single return type means switching
    # between flat and plain mode cannot silently change the meaning of
    # the aggregation (ADVICE r4).
    leftover = valid & ~done
    accept = accept | leftover
    return HashTable(t_fp0, t_fp1, t_g, claim), accept, leftover


def ht_lookup(tbl: HashTable, fp0: jnp.ndarray, fp1: jnp.ndarray,
              max_probes: int = 16, base=None,
              inst_capacity: int = 0) -> jnp.ndarray:
    """Best known cost per key, INF_G if absent (read-only).

    Mirrors ht_insert's probe rule: the first fp0-match-or-empty slot is
    inspected. A key stored BEHIND a foreign fp0-colliding slot in its
    probe chain reads as absent (~2^-32 per occupied probe slot) — a safe
    false-negative: the caller treats it as not-closed and re-expands.
    `base`/`inst_capacity`: flat multi-instance mode, see ht_insert."""
    h = tbl.fp0.shape[0]
    fp0 = _remap_empty(fp0)
    mask = (inst_capacity - 1) if base is not None else (h - 1)
    slots = _probe_slots(fp0, fp1, max_probes, mask, base)
    t0 = tbl.fp0[slots]
    stop = (t0 == fp0[:, None]) | (t0 == 0)
    has = jnp.any(stop, axis=1)
    first = jnp.argmax(stop, axis=1)
    sel = jnp.take_along_axis(slots, first[:, None], axis=1)[:, 0]
    t0_at = jnp.take_along_axis(t0, first[:, None], axis=1)[:, 0]
    found = has & (t0_at == fp0) & (tbl.fp1[sel] == fp1)
    return jnp.where(found, tbl.g[sel], INF_G)
