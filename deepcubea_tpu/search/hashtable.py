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
(0, 0) is the empty marker; real keys hitting it are remapped to (1, 1).

Batched insertion resolves same-slot contention with a persistent claim
array and gather-back verification — no sorts, no O(table) re-inits, no
atomics: every contender scatters its batch index into claim[slot]
(duplicate-index scatter keeps an arbitrary winner), reads the slot back,
and only the entry that sees its own index writes the key. Losers RETRY THE
SAME SLOT next round (it is now occupied: a same-key loser becomes a match,
a different-key loser advances its double-hash probe), which also makes
intra-batch duplicate keys converge to the match path. Stale claim values
are never read: a slot is only read back in the round it was written.
Entries still unplaced after the round budget are accepted WITHOUT
insertion (they may be re-expanded later; correctness is unaffected) and
counted in the overflow statistic.

All functions are single-instance; the search layer vmaps them over the
instance axis.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

INF_G = jnp.int32(0x7FFFFFFF)


class HashTable(NamedTuple):
    fp0: jnp.ndarray    # (H,) uint32, 0 = empty (together with fp1)
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


def _remap_empty(fp0: jnp.ndarray, fp1: jnp.ndarray):
    is_empty_key = (fp0 == 0) & (fp1 == 0)
    return (jnp.where(is_empty_key, jnp.uint32(1), fp0),
            jnp.where(is_empty_key, jnp.uint32(1), fp1))


def _slot(fp0: jnp.ndarray, fp1: jnp.ndarray, probe, mask: int) -> jnp.ndarray:
    # double hashing: step = fp1 | 1 is odd, so the probe sequence visits
    # every slot of the power-of-2 table
    step = fp1 | jnp.uint32(1)
    return ((fp0 + jnp.uint32(probe) * step) & jnp.uint32(mask)).astype(jnp.int32)


def ht_insert(tbl: HashTable, fp0: jnp.ndarray, fp1: jnp.ndarray,
              g: jnp.ndarray, valid: jnp.ndarray, max_probes: int = 16,
              ) -> Tuple[HashTable, jnp.ndarray, jnp.ndarray]:
    """Insert a batch of keys with costs; returns (table, accept, overflow).

    accept[i] is True iff entry i is new or strictly cheaper than the
    table's best known cost for its key (the reopen rule of
    astar.py:78-90 / cpp:243-265). overflow counts entries accepted without
    insertion after probe exhaustion.
    """
    n = fp0.shape[0]
    h = tbl.fp0.shape[0]
    mask = h - 1
    idx = jnp.arange(n, dtype=jnp.int32)

    fp0, fp1 = _remap_empty(fp0, fp1)

    def probe_round(_, carry):
        t_fp0, t_fp1, t_g, claim, accept, done, probe = carry
        active = ~done
        slot = _slot(fp0, fp1, probe, mask)
        t0, t1, tg = t_fp0[slot], t_fp1[slot], t_g[slot]

        empty = active & (t0 == 0) & (t1 == 0)
        match = active & (t0 == fp0) & (t1 == fp1)

        # matches: strictly cheaper reopens (scatter-min the cost;
        # duplicate-slot mins are associative)
        cheaper = match & (g < tg)
        t_g = t_g.at[jnp.where(cheaper, slot, h)].min(g, mode="drop")
        accept = accept | cheaper
        done = done | match

        # empties: contend via the claim array, gather-back verifies
        claim = claim.at[jnp.where(empty, slot, h)].set(idx, mode="drop")
        won = empty & (claim[slot] == idx)
        w_slots = jnp.where(won, slot, h)
        t_fp0 = t_fp0.at[w_slots].set(fp0, mode="drop")
        t_fp1 = t_fp1.at[w_slots].set(fp1, mode="drop")
        t_g = t_g.at[w_slots].set(g, mode="drop")
        accept = accept | won
        done = done | won

        # claim losers retry the SAME slot (now occupied: same-key loser
        # becomes a match next round); foreign-occupied slots advance
        lost = empty & ~won
        probe = probe + jnp.where(active & ~done & ~lost, 1, 0).astype(jnp.uint32)
        return t_fp0, t_fp1, t_g, claim, accept, done, probe

    init = (0, (tbl.fp0, tbl.fp1, tbl.g, tbl.claim,
                jnp.zeros((n,), bool), ~valid,
                jnp.zeros((n,), jnp.uint32)))

    def cond(state):
        r, carry = state
        done = carry[5]
        # early exit: at sane load factors almost everything places in the
        # first 2-3 rounds
        return (r < max_probes) & ~jnp.all(done)

    def body(state):
        r, carry = state
        return r + 1, probe_round(r, carry)

    _, (t_fp0, t_fp1, t_g, claim, accept, done, _) = jax.lax.while_loop(
        cond, body, init)

    # probe exhaustion: accept without insertion (safe, counts as overflow)
    leftover = ~done
    accept = accept | leftover
    overflow = jnp.sum(leftover.astype(jnp.int32))
    return HashTable(t_fp0, t_fp1, t_g, claim), accept, overflow


def ht_lookup(tbl: HashTable, fp0: jnp.ndarray, fp1: jnp.ndarray,
              max_probes: int = 16) -> jnp.ndarray:
    """Best known cost per key, INF_G if absent (read-only, no sorts)."""
    h = tbl.fp0.shape[0]
    mask = h - 1
    fp0, fp1 = _remap_empty(fp0, fp1)
    n = fp0.shape[0]

    def cond(state):
        p, best, done = state
        return (p < max_probes) & ~jnp.all(done)

    def body(state):
        p, best, done = state
        slot = _slot(fp0, fp1, p, mask)
        t0, t1, tg = tbl.fp0[slot], tbl.fp1[slot], tbl.g[slot]
        match = ~done & (t0 == fp0) & (t1 == fp1)
        empty = (t0 == 0) & (t1 == 0)
        best = jnp.where(match, tg, best)
        done = done | match | empty
        return p + 1, best, done

    _, best, _ = jax.lax.while_loop(
        cond, body,
        (0, jnp.full((n,), INF_G, jnp.int32), jnp.zeros((n,), bool)))
    return best
