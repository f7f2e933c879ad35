"""int8 serving path: BN folding must be exact, quantization error small,
and search results must match the f32 engine on a tiny domain."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from deepcubea_tpu.envs.registry import get_environment  # noqa: E402
from deepcubea_tpu.models.quant import (  # noqa: E402
    MARKER, _fold, is_quantized, layer_order, quant_forward,
    quantize_serving)
from deepcubea_tpu.models.resnet import (  # noqa: E402
    ResnetValueNet, forward_eval, init_variables)
from deepcubea_tpu.training.heuristic import heuristic_values  # noqa: E402


@pytest.fixture(scope="module")
def small_net():
    env = get_environment("lightsout4")
    model = ResnetValueNet(state_dim=16, one_hot_depth=6, h1_dim=64,
                           resnet_dim=32, num_resnet_blocks=2, out_dim=1,
                           batch_norm=True)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 16), jnp.uint8)
    params, stats = init_variables(model, key, env.encode(x0))
    # non-trivial BN statistics so folding is actually exercised
    stats = jax.tree_util.tree_map(
        lambda s: s + jax.random.uniform(key, s.shape) * 0.5 + 0.1, stats)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jax.random.normal(key, p.shape), params)
    return env, model, params, stats


def _folded_f32_forward(model, params, stats, x_enc):
    """Reference forward through the FOLDED (but unquantized) layers —
    isolates fold correctness from quantization noise."""
    layers = {}
    for dn, bn in layer_order(model):
        w, b = _fold(params[dn], params.get(bn) if bn else None,
                     stats.get(bn) if bn else None)
        layers[dn] = (jnp.asarray(w), jnp.asarray(b))

    if model.one_hot_depth > 0:
        x = jax.nn.one_hot(x_enc.astype(jnp.int32), model.one_hot_depth,
                           dtype=jnp.float32)
        x = x.reshape(x.shape[0], -1)
    else:
        x = x_enc.astype(jnp.float32)
    x = jax.nn.relu(x @ layers["fc1"][0] + layers["fc1"][1])
    x = jax.nn.relu(x @ layers["fc2"][0] + layers["fc2"][1])
    for bi in range(model.num_resnet_blocks):
        res = x
        x = jax.nn.relu(x @ layers[f"block{bi}_fc1"][0]
                        + layers[f"block{bi}_fc1"][1])
        x = x @ layers[f"block{bi}_fc2"][0] + layers[f"block{bi}_fc2"][1]
        x = jax.nn.relu(x + res)
    return (x @ layers["fc_out"][0] + layers["fc_out"][1])[:, 0]


def test_bn_fold_exact(small_net):
    env, model, params, stats = small_net
    # f32 model so the comparison isn't polluted by bf16 rounding
    model32 = model.clone(dtype=jnp.float32)
    key = jax.random.PRNGKey(1)
    states, _ = env.generate_scrambles(key, 64, 8)
    x = env.encode(states)
    ref = forward_eval(model32, params, stats, x)
    folded = _folded_f32_forward(model, params, stats, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(folded),
                               rtol=1e-4, atol=1e-4)


def test_int8_error_small(small_net):
    env, model, params, stats = small_net
    q = quantize_serving(model, params, stats)
    assert is_quantized(q) and MARKER in q
    key = jax.random.PRNGKey(2)
    states, _ = env.generate_scrambles(key, 256, 8)
    x = env.encode(states)
    ref = np.asarray(forward_eval(model.clone(dtype=jnp.float32),
                                  params, stats, x))
    qv = np.asarray(quant_forward(model, q, x))
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(qv - ref).max() / scale < 0.05, (
        np.abs(qv - ref).max(), scale)


def test_static_activation_scales_error_small(small_net):
    """Calibrated static activation scales (the fused serving path) must
    stay close to the f32 forward on held-out states, including states
    DEEPER than the calibration sample (margin headroom)."""
    from deepcubea_tpu.models.quant import calibrate_activation_scales
    env, model, params, stats = small_net
    q = quantize_serving(model, params, stats)
    cal, _ = env.generate_scrambles(jax.random.PRNGKey(4), 128, 6)
    qs = calibrate_activation_scales(model, q, env.encode(cal))
    assert any("as_" in v for v in qs.values() if isinstance(v, dict))
    states, _ = env.generate_scrambles(jax.random.PRNGKey(5), 256, 12)
    x = env.encode(states)
    ref = np.asarray(forward_eval(model.clone(dtype=jnp.float32),
                                  params, stats, x))
    qv = np.asarray(quant_forward(model, qs, x))
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(qv - ref).max() / scale < 0.08, (
        np.abs(qv - ref).max(), scale)


def test_heuristic_values_dispatch(small_net):
    env, model, params, stats = small_net
    q = quantize_serving(model, params, stats)
    key = jax.random.PRNGKey(3)
    states, _ = env.generate_scrambles(key, 32, 8)
    hq = heuristic_values(env, model, q, {}, states, clip_zero=True)
    hf = heuristic_values(env, model, params, stats, states, clip_zero=True)
    assert np.abs(np.asarray(hq) - np.asarray(hf)).mean() < 0.2
    assert (np.asarray(hq) >= 0).all()


def test_int8_solve_matches_f32(tmp_path, capsys, monkeypatch):
    """weight-1.0 BWAS on lightsout3 must return optimal (equal-length)
    solutions through the int8 path."""
    monkeypatch.chdir(tmp_path)
    from deepcubea_tpu.cli import generate_dataset, solve, train

    train.main(["--env", "lightsout3", "--nnet_name", "lo3", "--back_max",
                "2", "--batch_size", "128", "--states_per_update", "512",
                "--loss_thresh", "5.0", "--num_test", "12", "--h1_dim",
                "32", "--resnet_dim", "16", "--num_resnet_blocks", "1",
                "--debug", "--seed", "0", "--max_itrs", "8"])
    generate_dataset.main(["--env", "lightsout3", "--back_max", "3",
                           "--num_per_file", "6", "--num_files", "1",
                           "--save_dir", "testset"])
    capsys.readouterr()
    import pickle
    base = ["--states", "testset/data_0.pkl", "--model",
            "saved_models/lo3/current", "--env", "lightsout3", "--weight",
            "1.0", "--batch_size", "16", "--instances", "6",
            "--pool_capacity", "4096", "--table_capacity", "8192",
            "--max_iters", "100", "--debug"]
    solve.main(base + ["--results_dir", "r_f32"])
    solve.main(base + ["--results_dir", "r_int8", "--int8"])
    capsys.readouterr()
    with open(tmp_path / "r_f32" / "results.pkl", "rb") as f:
        a = pickle.load(f)
    with open(tmp_path / "r_int8" / "results.pkl", "rb") as f:
        b = pickle.load(f)
    assert all(s is not None for s in b["solutions"])
    assert [len(s) for s in a["solutions"]] == \
        [len(s) for s in b["solutions"]]
