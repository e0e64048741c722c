"""Golden parity + converter completeness for the Swin backbone vs the reference
torch ``SwinTransformer`` (``modeling/backbone/swin.py:498-683``), random weights
converted through ``convert_swin`` / ``convert_maskformer``, fp32 CPU.

The chosen spatial size makes res5 smaller than the window so the pad-to-window +
shifted-mask path (the part the reference never shrinks, swin.py:250-259) is
exercised, not just plain windows.
"""

import sys
import types

import numpy as np
import pytest

from test_m2f_parity import _install_stubs, _load

from multishiftseg_tpu.models.swin import SWIN_CONFIGS, SwinTransformer


def _stub_timm():
    if "timm.models.layers" in sys.modules:
        return
    import importlib.machinery

    import torch.nn as tnn

    def _mod(name):
        m = types.ModuleType(name)
        # non-None spec: transformers probes timm with find_spec, which raises
        # ValueError on __spec__ None (suite-order pollution otherwise)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    timm = _mod("timm")
    models = _mod("timm.models")
    layers = _mod("timm.models.layers")

    class DropPath(tnn.Module):  # identity at eval / drop_path_rate=0
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    layers.DropPath = DropPath
    layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    layers.trunc_normal_ = lambda t, *a, **k: t
    timm.models = models
    models.layers = layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


@pytest.fixture(scope="module")
def ref_swin_mod():
    pytest.importorskip("torch")
    _install_stubs()
    _stub_timm()
    return _load("refm2f.modeling.backbone.swin")


def _make_ref(ref_swin_mod, name):
    import torch

    cfg = SWIN_CONFIGS[name]
    torch.manual_seed(0)
    m = ref_swin_mod.SwinTransformer(
        embed_dim=cfg["embed_dim"], depths=list(cfg["depths"]),
        num_heads=list(cfg["num_heads"]), window_size=cfg["window_size"],
        ape=False, patch_norm=True, out_indices=(0, 1, 2, 3), frozen_stages=-1,
        drop_path_rate=0.0,
    )
    m.eval()
    return m


@pytest.mark.slow
def test_swin_tiny_forward_parity(ref_swin_mod, rng):
    import torch

    import jax.numpy as jnp

    from multishiftseg_tpu.convert.torch2jax import convert_swin

    ref = _make_ref(ref_swin_mod, "tiny")
    x = (rng.randn(1, 3, 64, 96) * 0.5).astype(np.float32)
    with torch.no_grad():
        outs_t = ref(torch.from_numpy(x))

    variables = convert_swin(ref.state_dict())
    ours = SwinTransformer(**SWIN_CONFIGS["tiny"])
    outs_j = ours.apply({"params": variables["params"]},
                        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    assert set(outs_j) == set(outs_t) == {"res2", "res3", "res4", "res5"}
    for k in outs_t:
        np.testing.assert_allclose(
            np.transpose(np.asarray(outs_j[k]), (0, 3, 1, 2)),
            outs_t[k].numpy(), atol=1e-4, rtol=1e-4, err_msg=k,
        )


@pytest.mark.parametrize("name", ["tiny", "small", "base", "large"])
def test_swin_converter_completeness(ref_swin_mod, name):
    """convert_swin of the reference torch state dict must cover our
    SwinTransformer.init tree exactly (keys AND shapes) for T/S/B/L."""
    import flax
    import jax
    import jax.numpy as jnp

    ref = _make_ref(ref_swin_mod, name)
    variables = convert_swin_cached(ref)
    ours = SwinTransformer(**SWIN_CONFIGS[name])
    init_shapes = jax.eval_shape(
        lambda: ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 64, 96, 3)), train=False)
    )
    want = {
        k: v.shape
        for k, v in flax.traverse_util.flatten_dict(init_shapes["params"]).items()
    }
    got = {
        k: np.shape(v)
        for k, v in flax.traverse_util.flatten_dict(variables["params"]).items()
    }
    assert got == want


def convert_swin_cached(ref):
    from multishiftseg_tpu.convert.torch2jax import convert_swin

    return convert_swin(ref.state_dict())


def test_convert_maskformer_routes_swin_backbone(ref_swin_mod):
    """A detectron2 checkpoint with a D2SwinTransformer backbone converts through
    convert_maskformer with the same result as convert_swin."""
    import flax

    from multishiftseg_tpu.convert.torch2jax import convert_maskformer, convert_swin

    ref = _make_ref(ref_swin_mod, "tiny")
    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    via_mf = convert_maskformer(sd, dec_layers=0)
    direct = convert_swin(ref.state_dict())
    a = flax.traverse_util.flatten_dict(via_mf["params"]["backbone"])
    b = flax.traverse_util.flatten_dict(direct["params"])
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_drop_path_train_only():
    """Stochastic depth (reference DROP_PATH_RATE 0.3): eval path is unaffected;
    train path drops whole per-sample residual branches under the dropout rng."""
    import jax
    import jax.numpy as jnp

    from multishiftseg_tpu.models.swin import SwinTransformer

    model = SwinTransformer(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                            window_size=4, drop_path_rate=0.5)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 16, 16, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    e1 = model.apply(v, x, train=False)
    e2 = model.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1["res2"]), np.asarray(e2["res2"]))

    # the linspace schedule gives block 0 rate 0.0 (reference swin.py:580-584), so
    # stochasticity shows from the second block on: check res3, not res2
    t1 = model.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = model.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(t1["res2"]), np.asarray(e1["res2"]))
    assert np.abs(np.asarray(t1["res3"]) - np.asarray(e1["res3"])).max() > 1e-6
    assert np.abs(np.asarray(t1["res3"]) - np.asarray(t2["res3"])).max() > 1e-6

    # rate 0 -> train == eval exactly
    m0 = SwinTransformer(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                         window_size=4, drop_path_rate=0.0)
    t0 = m0.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(t0["res3"]), np.asarray(e1["res3"]))
