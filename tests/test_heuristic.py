"""Host heuristic wrapper (chunk padding), fingerprint distribution."""

import jax
import numpy as np

from deepcubea_tpu.envs import Cube3, LightsOut
from deepcubea_tpu.envs.base import fingerprint, fingerprint_constants
from deepcubea_tpu.models import build_model, init_variables
from deepcubea_tpu.training import make_host_heuristic


def test_host_heuristic_chunking():
    env = LightsOut(3)
    cfg = dict(env.nnet_config)
    cfg.update(h1_dim=16, resnet_dim=16, num_resnet_blocks=1)
    model = build_model(cfg)
    params, stats = init_variables(model, jax.random.PRNGKey(0),
                                   env.encode(env.goal_states(2)))
    fn = make_host_heuristic(env, model, clip_zero=True, chunk_size=32)
    states, _ = env.generate_scrambles(jax.random.PRNGKey(1), 77, 4)
    out = fn(params, stats, np.asarray(states))
    assert out.shape == (77,)
    assert (out >= 0).all()  # clip_zero
    # chunk boundaries must not change values: compare against one chunk
    fn_big = make_host_heuristic(env, model, clip_zero=True, chunk_size=128)
    out2 = fn_big(params, stats, np.asarray(states))
    np.testing.assert_allclose(out, out2, rtol=1e-5, atol=1e-5)


def test_fingerprint_no_collisions_on_real_states():
    env = Cube3()
    states, _ = env.generate_scrambles(jax.random.PRNGKey(0), 20000, 30)
    consts = fingerprint_constants(env.state_width)
    f0, f1 = fingerprint(states, consts)
    keys = np.stack([np.asarray(f0), np.asarray(f1)], axis=1)
    uniq_states = np.unique(np.asarray(states), axis=0).shape[0]
    uniq_keys = np.unique(keys, axis=0).shape[0]
    assert uniq_keys == uniq_states


def test_fingerprint_bit_balance():
    env = Cube3()
    states, _ = env.generate_scrambles(jax.random.PRNGKey(1), 4096, 30)
    consts = fingerprint_constants(env.state_width)
    f0, _ = fingerprint(states, consts)
    bits = np.unpackbits(np.asarray(f0).view(np.uint8))
    assert 0.45 < bits.mean() < 0.55
