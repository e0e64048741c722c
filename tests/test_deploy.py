"""Serving-artifact export round-trip (``multishiftseg_tpu/deploy.py``).

The reference has no deployment path (its test scripts rebuild the torch model
in-process); the TPU framework exports the jitted eval forward to a StableHLO
artifact + flat weight npz and serves them with only jax. These tests prove
the round trip is numerically exact and the serving wrapper's pad/crop bucket
discipline matches running the model directly.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from multishiftseg_tpu.deploy import (
    ServingModel, export_forward, export_model, load_exported, load_npz_meta,
    load_pytree_npz, save_exported, save_pytree_npz,
)
from multishiftseg_tpu.models.deeplab import DeepWV3Plus
from multishiftseg_tpu.models.maskformer import MaskFormer, inference

TINY_TRUNK = dict(
    trunk_structure=(1, 1, 1, 1, 1, 1),
    trunk_channels=((8, 8), (8, 8), (16, 16), (16, 16), (8, 16, 32), (16, 32, 64)),
)


def test_pytree_npz_roundtrip(tmp_path):
    tree = {
        "params": {"conv": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4),
                            "bias": np.zeros(4, np.float32)}},
        "batch_stats": {"bn": {"mean": np.ones(4, np.float32)}},
    }
    p = str(tmp_path / "w.npz")
    save_pytree_npz(tree, p)
    back = load_pytree_npz(p)
    flat_a = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_meta_and_separator_guard(tmp_path):
    """Reserved __meta__/ entries ride beside the weights without disturbing
    the pytree, and a '/' inside a param name is refused at save time (it
    would silently re-split into extra nesting on load)."""
    tree = {"params": {"w": np.ones(3, np.float32)}}
    p = str(tmp_path / "m.npz")
    save_pytree_npz(tree, p, meta={"input_mean": np.asarray([0.5, 0.5, 0.5]),
                                   "normalization_baked": np.asarray(1)})
    back = load_pytree_npz(p)
    assert list(back) == ["params"] and list(back["params"]) == ["w"]
    meta = load_npz_meta(p)
    np.testing.assert_allclose(meta["input_mean"], [0.5, 0.5, 0.5])
    assert int(meta["normalization_baked"]) == 1

    with pytest.raises(ValueError, match="contains"):
        save_pytree_npz({"a/b": np.zeros(1, np.float32)}, str(tmp_path / "bad.npz"))


def test_export_model_debug_bounds_guard(monkeypatch, tmp_path):
    """MSS_DEBUG_BOUNDS=1 must fail fast with an actionable message, not a
    cryptic serialization error deep inside jax.export."""
    monkeypatch.setenv("MSS_DEBUG_BOUNDS", "1")
    with pytest.raises(RuntimeError, match="MSS_DEBUG_BOUNDS"):
        export_model("deeplab", None, None, str(tmp_path / "x"), 64, 64)


def _roundtrip(fwd, variables, tmp_path, h=48, w=40, bh=64, bw=64):
    exported = export_forward(fwd, variables, (1, bh, bw, 3))
    prefix = str(tmp_path / "model")
    save_exported(exported, prefix + ".stablehlo")
    save_pytree_npz(variables, prefix + ".npz")

    # serialized program reproduces the jitted forward bit-for-bit
    img_pad = jnp.asarray(np.random.RandomState(0).randn(1, bh, bw, 3), jnp.float32)
    direct = jax.jit(fwd)(variables, img_pad)
    replay = load_exported(prefix + ".stablehlo").call(variables, img_pad)
    for d, r in zip(jax.tree_util.tree_leaves(direct), jax.tree_util.tree_leaves(replay)):
        np.testing.assert_allclose(np.asarray(d), np.asarray(r), rtol=1e-6, atol=1e-6)

    # ServingModel pads to the exported bucket and crops back — identical to
    # running the model on the same padded buffer and cropping by hand
    serving = ServingModel(prefix)
    assert serving.input_shape == (1, bh, bw, 3)
    small = np.asarray(img_pad)[:, :h, :w]
    buf = np.zeros((1, bh, bw, 3), np.float32)
    buf[:, :h, :w] = small
    exp_anom, exp_sem = jax.jit(fwd)(variables, jnp.asarray(buf))
    got_anom, got_sem = serving(small)
    np.testing.assert_allclose(got_anom, np.asarray(exp_anom)[:, :h, :w],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_sem, np.asarray(exp_sem)[:, :, :h, :w],
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_export_serving_roundtrip_deeplab(tmp_path):
    model = DeepWV3Plus(num_classes=19, **TINY_TRUNK)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False)

    def fwd(variables, img):
        score, logit = model.apply(variables, img, train=False)
        return score, logit.transpose(0, 3, 1, 2)

    _roundtrip(fwd, variables, tmp_path)


@pytest.mark.slow
def test_multiplatform_export(tmp_path):
    """One artifact lowered for both cpu and tpu (TPU fleet + CPU canaries)
    from a CPU-only host; still runnable here and unchanged numerically."""
    model = DeepWV3Plus(num_classes=19, **TINY_TRUNK)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False)

    def fwd(variables, img):
        score, logit = model.apply(variables, img, train=False)
        return score, logit.transpose(0, 3, 1, 2)

    exported = export_forward(fwd, variables, (1, 64, 64, 3),
                              platforms=("cpu", "tpu"))
    assert exported.platforms == ("cpu", "tpu")
    prefix = str(tmp_path / "mp")
    save_exported(exported, prefix + ".stablehlo")
    img = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    replay = load_exported(prefix + ".stablehlo").call(variables, img)
    direct = jax.jit(fwd)(variables, img)
    np.testing.assert_allclose(np.asarray(replay[0]), np.asarray(direct[0]),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_export_serving_roundtrip_m2f(tmp_path, monkeypatch):
    # the MSS_DEBUG_BOUNDS jax.debug.callback (suite-wide via conftest) is a
    # host callback — unserializable by design; production export runs with
    # the check off (its default)
    monkeypatch.setenv("MSS_DEBUG_BOUNDS", "0")
    model = MaskFormer(num_classes=5, hidden_dim=64, num_queries=8, nheads=4,
                       dim_feedforward=128, dec_layers=3, mask_dim=64,
                       transformer_enc_layers=2)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False)

    def fwd(variables, img):
        outputs = model.apply(variables, img, train=False)
        sem, anomaly = inference(outputs, img.shape[1:3], num_classes=5)
        return anomaly, sem

    _roundtrip(fwd, variables, tmp_path)
