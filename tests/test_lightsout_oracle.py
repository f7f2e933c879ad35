"""The GF(2) oracle must agree with brute-force BFS through the real env."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from deepcubea_tpu.envs.lightsout import LightsOut  # noqa: E402
from deepcubea_tpu.envs.lightsout_oracle import LightsOutOracle  # noqa: E402


def bfs_cost(env, state, max_depth=6):
    goal = np.zeros(env.state_width, np.uint8)
    frontier = {tuple(state)}
    seen = set(frontier)
    if tuple(goal) in frontier:
        return 0
    for d in range(1, max_depth + 1):
        nxt = set()
        for s in frontier:
            children, _ = env.expand(jnp.asarray(np.array(s)[None]))
            for c in np.asarray(children)[0]:
                t = tuple(c)
                if t not in seen:
                    seen.add(t)
                    nxt.add(t)
        if tuple(goal) in nxt:
            return d
        frontier = nxt
    return None


def test_oracle_vs_bfs_lightsout4():
    env = LightsOut(4)
    oracle = LightsOutOracle(4)
    # 4x4 lightsout has a 4-dimensional kernel: the coset search must still
    # return true optima
    key = jax.random.PRNGKey(3)
    states, _ = env.generate_scrambles(
        key, 24, 4, depths=jnp.full((24,), 4, jnp.int32))
    s_np = np.asarray(states)
    opt = oracle.optimal_costs(s_np)
    for s, o in zip(s_np, opt):
        b = bfs_cost(env, s)
        assert b is not None and b == o, (s, o, b)


def test_oracle_7x7_invertible_and_matches_scramble_parity():
    oracle = LightsOutOracle(7)
    assert oracle.rank == 49 and len(oracle.kernel) == 0
    env = LightsOut(7)
    # a known scramble's press-parity vector upper-bounds the optimum; for
    # few presses with distinct cells it is exact
    rng = np.random.default_rng(0)
    for _ in range(10):
        presses = rng.choice(49, size=5, replace=False)
        s = np.zeros(49, np.uint8)
        for p in presses:
            s ^= oracle.a[p]
        assert oracle.optimal_costs(s[None])[0] == 5


def test_reference_test_set_optimal_mean():
    import os
    path = "/root/reference/data/lightsout7/test/data_0.pkl"
    if not os.path.exists(path):
        pytest.skip("reference data not mounted")
    from deepcubea_tpu.envs.registry import get_environment
    from deepcubea_tpu.utils.compat import load_test_set

    env = get_environment("lightsout7")
    test = load_test_set(path, env)
    opt = LightsOutOracle(7).optimal_costs(np.asarray(test["states"]))
    assert (opt >= 0).all()
    # the reference's shipped solver results average exactly this: its
    # lightsout7 solutions were 100% optimal (results/lightsout7/output.txt)
    assert abs(opt.mean() - 24.26) < 0.01
