"""convert_maskformer completeness: a synthetic detectron2-style state dict (derived
by inverse-mapping the flax init tree) must convert to exactly the init tree's keys
and shapes."""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from multishiftseg_tpu.convert.torch2jax import convert_maskformer
from multishiftseg_tpu.models.maskformer import MaskFormer


class T:
    """Minimal tensor stand-in with .detach().cpu().numpy()."""

    def __init__(self, arr):
        self.arr = arr

    def detach(self):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self.arr


def _rand(rng, shape):
    return T(rng.randn(*shape).astype(np.float32))


def build_d2_state_dict(rng, dec_layers=9):
    sd = {}

    def conv(prefix, cin, cout, k, bias=False):
        sd[f"{prefix}.weight"] = _rand(rng, (cout, cin, k, k))
        if bias:
            sd[f"{prefix}.bias"] = _rand(rng, (cout,))

    def bn(prefix, c):
        for suffix, shape in (("weight", (c,)), ("bias", (c,)),
                              ("running_mean", (c,)), ("running_var", (c,))):
            sd[f"{prefix}.{suffix}"] = _rand(rng, shape)

    def dense(prefix, cin, cout):
        sd[f"{prefix}.weight"] = _rand(rng, (cout, cin))
        sd[f"{prefix}.bias"] = _rand(rng, (cout,))

    def mha(prefix, d):
        sd[f"{prefix}.in_proj_weight"] = _rand(rng, (3 * d, d))
        sd[f"{prefix}.in_proj_bias"] = _rand(rng, (3 * d,))
        dense(f"{prefix}.out_proj", d, d)

    # backbone: R-50
    conv("backbone.stem.conv1", 3, 64, 7)
    bn("backbone.stem.conv1.norm", 64)
    stages = {2: (3, 64, 256), 3: (4, 128, 512), 4: (6, 256, 1024), 5: (3, 512, 2048)}
    in_ch = 64
    for stage, (blocks, mid, out) in stages.items():
        for b in range(blocks):
            base = f"backbone.res{stage}.{b}"
            conv(f"{base}.conv1", in_ch if b == 0 else out, mid, 1)
            bn(f"{base}.conv1.norm", mid)
            conv(f"{base}.conv2", mid, mid, 3)
            bn(f"{base}.conv2.norm", mid)
            conv(f"{base}.conv3", mid, out, 1)
            bn(f"{base}.conv3.norm", out)
            if b == 0:
                conv(f"{base}.shortcut", in_ch, out, 1)
                bn(f"{base}.shortcut.norm", out)
        in_ch = out

    # pixel decoder
    pd = "sem_seg_head.pixel_decoder"
    for i, cin in enumerate((2048, 1024, 512)):
        conv(f"{pd}.input_proj.{i}.0", cin, 256, 1, bias=True)
        sd[f"{pd}.input_proj.{i}.1.weight"] = _rand(rng, (256,))
        sd[f"{pd}.input_proj.{i}.1.bias"] = _rand(rng, (256,))
    sd[f"{pd}.transformer.level_embed"] = _rand(rng, (3, 256))
    for i in range(6):
        enc = f"{pd}.transformer.encoder.layers.{i}"
        dense(f"{enc}.self_attn.sampling_offsets", 256, 8 * 3 * 4 * 2)
        dense(f"{enc}.self_attn.attention_weights", 256, 8 * 3 * 4)
        dense(f"{enc}.self_attn.value_proj", 256, 256)
        dense(f"{enc}.self_attn.output_proj", 256, 256)
        dense(f"{enc}.linear1", 256, 1024)
        dense(f"{enc}.linear2", 1024, 256)
        for n in ("norm1", "norm2"):
            sd[f"{enc}.{n}.weight"] = _rand(rng, (256,))
            sd[f"{enc}.{n}.bias"] = _rand(rng, (256,))
    conv(f"{pd}.adapter_1", 256, 256, 1)
    sd[f"{pd}.adapter_1.norm.weight"] = _rand(rng, (256,))
    sd[f"{pd}.adapter_1.norm.bias"] = _rand(rng, (256,))
    conv(f"{pd}.layer_1", 256, 256, 3)
    sd[f"{pd}.layer_1.norm.weight"] = _rand(rng, (256,))
    sd[f"{pd}.layer_1.norm.bias"] = _rand(rng, (256,))
    conv(f"{pd}.mask_features", 256, 256, 1, bias=True)

    # predictor (GMA) — use legacy 'static_query' name to exercise the migration
    pr = "sem_seg_head.predictor"
    sd[f"{pr}.static_query.weight"] = _rand(rng, (100, 256))
    sd[f"{pr}.query_embed.weight"] = _rand(rng, (100, 256))
    sd[f"{pr}.level_embed.weight"] = _rand(rng, (3, 256))
    for i in range(dec_layers):
        mha(f"{pr}.transformer_cross_attention_layers.{i}.multihead_attn_foreground", 256)
        mha(f"{pr}.transformer_cross_attention_layers.{i}.multihead_attn_background", 256)
        sd[f"{pr}.transformer_cross_attention_layers.{i}.norm.weight"] = _rand(rng, (256,))
        sd[f"{pr}.transformer_cross_attention_layers.{i}.norm.bias"] = _rand(rng, (256,))
        mha(f"{pr}.transformer_self_attention_layers.{i}.self_attn", 256)
        sd[f"{pr}.transformer_self_attention_layers.{i}.norm.weight"] = _rand(rng, (256,))
        sd[f"{pr}.transformer_self_attention_layers.{i}.norm.bias"] = _rand(rng, (256,))
        dense(f"{pr}.transformer_ffn_layers.{i}.linear1", 256, 2048)
        dense(f"{pr}.transformer_ffn_layers.{i}.linear2", 2048, 256)
        sd[f"{pr}.transformer_ffn_layers.{i}.norm.weight"] = _rand(rng, (256,))
        sd[f"{pr}.transformer_ffn_layers.{i}.norm.bias"] = _rand(rng, (256,))
    sd[f"{pr}.decoder_norm.weight"] = _rand(rng, (256,))
    sd[f"{pr}.decoder_norm.bias"] = _rand(rng, (256,))
    dense(f"{pr}.class_embed", 256, 20)
    dense(f"{pr}.class_embed2", 256, 20)
    for i in range(3):
        dense(f"{pr}.mask_embed.layers.{i}", 256, 256)

    return sd


def test_convert_maskformer_tree_complete(rng):
    sd = build_d2_state_dict(rng)
    variables = convert_maskformer(sd, dec_layers=9)

    model = MaskFormer(num_classes=19, backbone="resnet50")
    init_vars = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 128, 3), jnp.float32), train=False,
        )
    )
    for col in ("params", "batch_stats"):
        got = set(flax.traverse_util.flatten_dict(variables[col]).keys())
        want = set(flax.traverse_util.flatten_dict(init_vars[col]).keys())
        assert got == want, (
            f"{col}: missing={sorted(want - got)[:6]} extra={sorted(got - want)[:6]}"
        )
    got_flat = flax.traverse_util.flatten_dict(variables["params"])
    want_flat = flax.traverse_util.flatten_dict(init_vars["params"])
    for k, v in got_flat.items():
        assert v.shape == want_flat[k].shape, (k, v.shape, want_flat[k].shape)
    # legacy static_query migrated
    assert ("predictor", "query_feat") in {
        k[:2] for k in got_flat
    }


def test_convert_stock_checkpoint_without_ood_head(rng):
    """Stock Mask2Former checkpoints (no class_embed2) convert with the OOD head
    initialized by class_embed weight copy (reference train_m2f.py:125-132)."""
    sd = build_d2_state_dict(np.random.RandomState(3))
    pr = "sem_seg_head.predictor"
    del sd[f"{pr}.class_embed2.weight"], sd[f"{pr}.class_embed2.bias"]
    variables = convert_maskformer(sd)
    p = variables["params"]["predictor"]
    np.testing.assert_array_equal(p["class_embed2"]["kernel"],
                                  p["class_embed"]["kernel"])
    np.testing.assert_array_equal(p["class_embed2"]["bias"],
                                  p["class_embed"]["bias"])
