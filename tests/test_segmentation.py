"""Segmentation model + inference engine tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.models import InferenceEngine, SegmentationNet, make_train_step


def test_fake_mode_matches_reference_semantics():
    eng = InferenceEngine(None, width=64, height=48)
    ht, lt = eng.infer_one(np.zeros((48, 64, 3), np.uint8))
    assert ht.shape == (48, 64) and lt.shape == (48, 64)
    np.testing.assert_array_equal(ht, 1.0)
    np.testing.assert_array_equal(lt, 1.0)


@pytest.mark.slow
def test_random_engine_outputs_probabilities(tmp_path):
    # two-level UNet: the 3-level variant only adds ~13 s of XLA compile
    # to the fast tier without exercising any extra code path
    eng = InferenceEngine("__random__", width=64, height=48, widths=(8, 16))
    rgb = (np.random.default_rng(0).uniform(0, 255, (48, 64, 3))).astype(np.uint8)
    ht, lt = eng.infer_one(rgb)
    assert ht.shape == (48, 64)
    np.testing.assert_allclose(ht + lt, 1.0, atol=1e-3)  # softmax pair
    assert (ht >= 0).all() and (ht <= 1).all()

    # save / load round trip
    path = str(tmp_path / "seg.msgpack")
    eng.save(path)
    eng2 = InferenceEngine(path, width=64, height=48, widths=(8, 16))
    ht2, _ = eng2.infer_one(rgb)
    np.testing.assert_allclose(ht, ht2, atol=1e-5)


@pytest.mark.slow  # fast tier keeps the main seg forward/training tests
def test_non_multiple_of_32_input():
    eng = InferenceEngine("__random__", width=50, height=35, widths=(8, 16))
    ht, lt = eng.infer_one(np.zeros((35, 50, 3), np.uint8))
    assert ht.shape == (35, 50) and lt.shape == (35, 50)


def test_training_step_reduces_loss():
    import optax

    net = SegmentationNet(widths=(8, 16), num_classes=2)
    x = jnp.stack(
        [
            jnp.concatenate(
                [jnp.ones((32, 16, 3)), jnp.zeros((32, 16, 3))], axis=1
            )
        ]
    )  # left half bright -> class 0, right half dark -> class 1
    y = jnp.concatenate(
        [jnp.zeros((1, 32, 16), jnp.int32), jnp.ones((1, 32, 16), jnp.int32)],
        axis=2,
    )
    params = net.init(jax.random.PRNGKey(0), x)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = make_train_step(net, opt)
    losses = []
    for _ in range(12):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses
