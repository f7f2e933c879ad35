"""Hash table: insert/lookup/reopen semantics, batch duplicates, collisions."""

import jax.numpy as jnp
import numpy as np

from deepcubea_tpu.search.hashtable import (INF_G, ht_insert, ht_lookup,
                                            ht_new)


def mk(n, seed=0):
    rng = np.random.RandomState(seed)
    fp0 = rng.randint(1, 2**31, size=n).astype(np.uint32)
    fp1 = rng.randint(1, 2**31, size=n).astype(np.uint32)
    return jnp.asarray(fp0), jnp.asarray(fp1)


def test_insert_then_lookup():
    tbl = ht_new(256)
    fp0, fp1 = mk(32)
    g = jnp.arange(32, dtype=jnp.int32)
    tbl, accept, ovf = ht_insert(tbl, fp0, fp1, g, jnp.ones(32, bool))
    assert np.asarray(accept).all()
    assert int(np.asarray(ovf).sum()) == 0
    got = ht_lookup(tbl, fp0, fp1)
    np.testing.assert_array_equal(np.asarray(got), np.arange(32))


def test_absent_lookup():
    tbl = ht_new(64)
    fp0, fp1 = mk(8)
    got = ht_lookup(tbl, fp0, fp1)
    assert (np.asarray(got) == int(INF_G)).all()


def test_duplicate_insert_rejected():
    tbl = ht_new(128)
    fp0, fp1 = mk(16)
    g = jnp.full((16,), 5, jnp.int32)
    tbl, a1, _ = ht_insert(tbl, fp0, fp1, g, jnp.ones(16, bool))
    tbl, a2, _ = ht_insert(tbl, fp0, fp1, g, jnp.ones(16, bool))
    assert np.asarray(a1).all()
    assert not np.asarray(a2).any()  # same cost: not strictly cheaper


def test_reopen_cheaper():
    tbl = ht_new(128)
    fp0, fp1 = mk(16)
    tbl, _, _ = ht_insert(tbl, fp0, fp1, jnp.full((16,), 9, jnp.int32),
                          jnp.ones(16, bool))
    tbl, a2, _ = ht_insert(tbl, fp0, fp1, jnp.full((16,), 3, jnp.int32),
                           jnp.ones(16, bool))
    assert np.asarray(a2).all()
    np.testing.assert_array_equal(np.asarray(ht_lookup(tbl, fp0, fp1)), 3)
    # and not re-accepted at the old worse cost
    tbl, a3, _ = ht_insert(tbl, fp0, fp1, jnp.full((16,), 9, jnp.int32),
                           jnp.ones(16, bool))
    assert not np.asarray(a3).any()


def test_intra_batch_duplicates_keep_min():
    tbl = ht_new(128)
    fp0, fp1 = mk(4)
    # duplicate every key 3x with different costs
    f0 = jnp.tile(fp0, 3)
    f1 = jnp.tile(fp1, 3)
    g = jnp.concatenate([jnp.full((4,), 7), jnp.full((4,), 2),
                         jnp.full((4,), 5)]).astype(jnp.int32)
    tbl, accept, _ = ht_insert(tbl, f0, f1, g, jnp.ones(12, bool))
    accept = np.asarray(accept)
    # the stored cost is always the min across duplicates
    np.testing.assert_array_equal(np.asarray(ht_lookup(tbl, fp0, fp1)), 2)
    # the min-cost duplicate is always accepted; a worse one may be accepted
    # first (it becomes a stale open entry, skipped at pop), never after
    assert accept[4:8].all()          # the g=2 copies
    assert 4 <= accept.sum() <= 8
    # equal-cost re-insert of the stored min is rejected
    tbl, accept2, _ = ht_insert(tbl, fp0, fp1, jnp.full((4,), 2, jnp.int32),
                                jnp.ones(4, bool))
    assert not np.asarray(accept2).any()


def test_invalid_entries_ignored():
    tbl = ht_new(64)
    fp0, fp1 = mk(8)
    valid = jnp.asarray([True, False] * 4)
    tbl, accept, _ = ht_insert(tbl, fp0, fp1, jnp.zeros(8, jnp.int32), valid)
    np.testing.assert_array_equal(np.asarray(accept), np.asarray(valid))
    got = np.asarray(ht_lookup(tbl, fp0, fp1))
    assert (got[::2] == 0).all()
    assert (got[1::2] == int(INF_G)).all()


def test_high_load_probing():
    # fill a small table to 75% load; all inserts must still land
    tbl = ht_new(1024)
    fp0, fp1 = mk(768, seed=3)
    tbl, accept, ovf = ht_insert(tbl, fp0, fp1,
                                 jnp.arange(768, dtype=jnp.int32),
                                 jnp.ones(768, bool), max_probes=32)
    assert np.asarray(accept).all()
    got = np.asarray(ht_lookup(tbl, fp0, fp1, max_probes=32))
    miss = (got != np.arange(768)).sum()
    # overflow entries are accepted but not stored; everything stored must
    # read back exactly
    assert miss == int(np.asarray(ovf).sum())
    assert int(np.asarray(ovf).sum()) <= 8


def test_zero_key_remap():
    tbl = ht_new(64)
    fp0 = jnp.zeros((1,), jnp.uint32)
    fp1 = jnp.zeros((1,), jnp.uint32)
    tbl, accept, _ = ht_insert(tbl, fp0, fp1, jnp.zeros(1, jnp.int32),
                               jnp.ones(1, bool))
    assert np.asarray(accept).all()
    np.testing.assert_array_equal(np.asarray(ht_lookup(tbl, fp0, fp1)), 0)


def test_multi_pass_reduces_contention_overflow():
    """Single-pass inserts lose same-slot contention to foreign keys (the
    birthday bound); each extra pass shrinks the loss quadratically."""
    tbl1 = ht_new(256)
    tbl3 = ht_new(256)
    fp0, fp1 = mk(128, seed=11)
    g = jnp.zeros((128,), jnp.int32)
    v = jnp.ones(128, bool)
    _, _, ovf1 = ht_insert(tbl1, fp0, fp1, g, v, passes=1)
    tbl3, acc3, ovf3 = ht_insert(tbl3, fp0, fp1, g, v, passes=3)
    assert int(np.asarray(ovf3).sum()) <= int(np.asarray(ovf1).sum())
    assert int(np.asarray(ovf3).sum()) <= 2
    # everything that was stored reads back
    got = np.asarray(ht_lookup(tbl3, fp0, fp1))
    assert (got[np.asarray(acc3)] == 0).all()


def test_flat_multi_instance_matches_vmapped():
    """Flat base-offset mode (round-4 instance-axis fix) must reproduce the
    vmapped per-instance semantics exactly: same accepts, same lookups."""
    import jax

    rng = np.random.RandomState(7)
    I, N, H = 3, 64, 256
    fp0 = jnp.asarray(rng.randint(1, 2**32, (I, N), dtype=np.uint64)
                      .astype(np.uint32))
    fp1 = jnp.asarray(rng.randint(0, 2**32, (I, N), dtype=np.uint64)
                      .astype(np.uint32))
    g = jnp.asarray(rng.randint(0, 50, (I, N)).astype(np.int32))
    valid = jnp.asarray(rng.rand(I, N) < 0.9)

    # vmapped reference path
    tbl_v = jax.vmap(lambda _: ht_new(H))(jnp.arange(I))
    tbl_v, acc_v, _ = jax.vmap(ht_insert, in_axes=(0, 0, 0, 0, 0, None))(
        tbl_v, fp0, fp1, g, valid, 6)
    got_v = jax.vmap(ht_lookup, in_axes=(0, 0, 0, None))(tbl_v, fp0, fp1, 6)

    # flat path
    from deepcubea_tpu.search.hashtable import HashTable
    tbl_f = HashTable(*(x.reshape(-1) for x in tbl_v._replace(
        fp0=jnp.zeros((I, H), jnp.uint32), fp1=jnp.zeros((I, H), jnp.uint32),
        g=jnp.full((I, H), INF_G, jnp.int32),
        claim=jnp.zeros((I, H), jnp.int32))))
    base = jnp.repeat(jnp.arange(I, dtype=jnp.int32) * H, N)
    tbl_f, acc_f, left = ht_insert(tbl_f, fp0.reshape(-1), fp1.reshape(-1),
                                   g.reshape(-1), valid.reshape(-1), 6,
                                   base=base, inst_capacity=H)
    got_f = ht_lookup(tbl_f, fp0.reshape(-1), fp1.reshape(-1), 6,
                      base=base, inst_capacity=H)

    np.testing.assert_array_equal(np.asarray(acc_v).reshape(-1),
                                  np.asarray(acc_f))
    np.testing.assert_array_equal(np.asarray(got_v).reshape(-1),
                                  np.asarray(got_f))
    assert not np.asarray(left).any()  # no overflow at this load
