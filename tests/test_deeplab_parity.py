"""Golden parity: our flax DeepWV3Plus vs the reference torch model (random weights
converted through ``convert_deeplab``), eval mode, fp32 CPU.

This validates the architecture AND the checkpoint converter in one shot — the same
path a released ``*_best_model.pth`` takes.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def reference_model():
    # Stub the reference's import-time config machinery (easydict + argparse globals);
    # the model code itself only needs torch.
    if "easydict" not in sys.modules:
        fake = types.ModuleType("easydict")

        class EasyDict(dict):
            __getattr__ = dict.get
            __setattr__ = dict.__setitem__

        fake.EasyDict = EasyDict
        sys.modules["easydict"] = fake
    pa = types.ModuleType("lib.configs.parse_arg")
    pa.opt = sys.modules["easydict"].EasyDict()
    pa.args = None
    sys.modules["lib.configs.parse_arg"] = pa
    sys.path.insert(0, "/root/reference")
    try:
        from lib.network.deepv3.deepv3 import DeepWV3Plus as TorchDeepWV3Plus
    finally:
        sys.path.remove("/root/reference")

    import torch

    torch.manual_seed(0)
    m = TorchDeepWV3Plus(19)
    m.eval()
    return m


def test_forward_parity_with_reference(reference_model, rng):
    import torch

    from multishiftseg_tpu.convert.torch2jax import convert_deeplab
    from multishiftseg_tpu.models.deeplab import DeepWV3Plus

    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref_score, ref_logit = reference_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )

    variables = convert_deeplab(reference_model.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = DeepWV3Plus(num_classes=19)  # fp32
    score, logit = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(
        np.asarray(logit), ref_logit.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(score), ref_score.numpy(), rtol=1e-3, atol=2e-4
    )


def test_converted_tree_is_complete(reference_model):
    """Converted tree must exactly cover the flax init tree (no missing/extra leaves)."""
    import flax

    from multishiftseg_tpu.convert.torch2jax import convert_deeplab
    from multishiftseg_tpu.models.deeplab import DeepWV3Plus

    variables = convert_deeplab(reference_model.state_dict())
    model = DeepWV3Plus(num_classes=19)
    init_vars = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            train=False,
        )
    )
    for col in ("params", "batch_stats"):
        got = set(flax.traverse_util.flatten_dict(variables[col]).keys())
        want = set(flax.traverse_util.flatten_dict(init_vars[col]).keys())
        assert got == want, (
            f"{col}: missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
        )
    # shape agreement
    got_flat = flax.traverse_util.flatten_dict(variables["params"])
    want_flat = flax.traverse_util.flatten_dict(init_vars["params"])
    for k, v in got_flat.items():
        assert v.shape == want_flat[k].shape, (k, v.shape, want_flat[k].shape)
