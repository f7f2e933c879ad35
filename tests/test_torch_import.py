"""Torch checkpoint import: EXACT forward equivalence between the reference
torch ResnetModel and our flax net under imported weights — the strongest
architecture-parity check (BN statistics included)."""

import numpy as np
import pytest

from deepcubea_tpu.envs import Cube3
from deepcubea_tpu.models import build_model, forward_eval
from deepcubea_tpu.utils.torch_import import import_torch_state_dict


def test_forward_equivalence_with_reference_torch(reference_path):
    torch = pytest.importorskip("torch")
    from utils.pytorch_models import ResnetModel

    torch.manual_seed(0)
    ref = ResnetModel(54, 6, 64, 32, 2, 1, True)
    ref.eval()
    # make BN running stats non-trivial
    with torch.no_grad():
        ref.train()
        for _ in range(3):
            ref(torch.randint(0, 6, (32, 54)))
        ref.eval()

    params, stats = import_torch_state_dict(ref.state_dict(),
                                            num_resnet_blocks=2)

    import jax.numpy as jnp
    env = Cube3()
    model = build_model(dict(state_dim=54, one_hot_depth=6, h1_dim=64,
                             resnet_dim=32, num_resnet_blocks=2, out_dim=1,
                             batch_norm=True), dtype=jnp.float32)

    x = np.random.RandomState(1).randint(0, 6, (16, 54))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()[:, 0]
    ours = np.asarray(forward_eval(model, params, stats, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


def test_dataparallel_prefix_stripped():
    sd = {
        "module.fc1.weight": np.zeros((8, 4), np.float32),
        "module.fc1.bias": np.zeros((8,), np.float32),
        "module.fc2.weight": np.zeros((2, 8), np.float32),
        "module.fc2.bias": np.zeros((2,), np.float32),
        "module.fc_out.weight": np.zeros((1, 2), np.float32),
        "module.fc_out.bias": np.zeros((1,), np.float32),
    }
    params, stats = import_torch_state_dict(sd, num_resnet_blocks=0)
    assert params["fc1"]["kernel"].shape == (4, 8)
    assert stats == {}


def test_solve_cli_accepts_torch_pt(reference_path, tmp_path):
    """The migration path end-to-end: a reference-format torch checkpoint
    file drives the solve CLI directly (nnet_utils.py:134-152 load shape)."""
    torch = pytest.importorskip("torch")
    from utils.pytorch_models import ResnetModel

    from deepcubea_tpu.cli import solve
    from deepcubea_tpu.envs import get_environment

    env = get_environment("lightsout3")
    torch.manual_seed(0)
    ref = ResnetModel(env.state_width, env.one_hot_depth, 32, 16, 1, 1, True)
    pt = tmp_path / "model_state_dict.pt"
    torch.save(ref.state_dict(), pt)

    import jax
    states, _ = env.generate_scrambles(jax.random.PRNGKey(3), 6, 2)
    import numpy as np
    import pickle
    states_pkl = tmp_path / "states.pkl"
    with open(states_pkl, "wb") as f:
        pickle.dump({"states": np.asarray(states)}, f)

    solve.main(["--states", str(states_pkl), "--model", str(pt),
                "--env", "lightsout3", "--weight", "1.0",
                "--batch_size", "16", "--instances", "6",
                "--h1_dim", "32", "--resnet_dim", "16",
                "--num_resnet_blocks", "1",
                "--pool_capacity", "4096", "--table_capacity", "8192",
                "--results_dir", str(tmp_path / "res"),
                "--max_iters", "64", "--debug"])
    with open(tmp_path / "res" / "results.pkl", "rb") as f:
        res = pickle.load(f)
    assert all(s is not None for s in res["solutions"])
