"""Model-zoo coverage: every registered variant builds, runs, and produces sane
shapes on tiny inputs (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multishiftseg_tpu.models.deepv3_generic import DeepV3Plus
from multishiftseg_tpu.models.fpn_decoder import BasePixelDecoder, TransformerEncoderPixelDecoder
from multishiftseg_tpu.models.inference_extras import (
    hflip_tta, instance_inference, panoptic_inference,
)
from multishiftseg_tpu.models.maskformer import MaskFormer
from multishiftseg_tpu.models.swin import SwinTransformer, SWIN_CONFIGS


def _feats(rng, n=1, base=8):
    return {
        "res2": jnp.asarray(rng.randn(n, base * 8, base * 8, 256).astype(np.float32)),
        "res3": jnp.asarray(rng.randn(n, base * 4, base * 4, 512).astype(np.float32)),
        "res4": jnp.asarray(rng.randn(n, base * 2, base * 2, 1024).astype(np.float32)),
        "res5": jnp.asarray(rng.randn(n, base, base, 2048).astype(np.float32)),
    }


@pytest.mark.slow
@pytest.mark.parametrize("trunk", ["seresnext-50", "resnet-50"])
def test_deepv3_generic_builds(rng, trunk):
    model = DeepV3Plus(num_classes=19, trunk=trunk)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 19)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("cls", [BasePixelDecoder, TransformerEncoderPixelDecoder])
def test_fpn_decoders(rng, cls):
    feats = _feats(rng)
    dec = cls(transformer_enc_layers=2) if cls is TransformerEncoderPixelDecoder else cls()
    v = dec.init(jax.random.PRNGKey(0), feats)
    mask_features, top, multi = dec.apply(v, feats)
    assert mask_features.shape == (1, 64, 64, 256)
    assert len(multi) == 3
    assert multi[0].shape[1] == 8  # coarsest first


@pytest.mark.slow
def test_maskformer_vanilla_predictor(rng):
    model = MaskFormer(num_classes=5, hidden_dim=64, num_queries=8, nheads=4,
                       dim_feedforward=128, dec_layers=3, mask_dim=64,
                       transformer_enc_layers=2, predictor="vanilla")
    img = jnp.zeros((1, 64, 128, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, img, train=False)
    out = model.apply(v, img, train=False)
    assert set(out) == {"pred_logits", "pred_masks", "aux_outputs"}
    assert out["pred_logits"].shape == (1, 8, 6)
    assert out["pred_masks"].shape == (1, 8, 16, 32)


@pytest.mark.slow
def test_maskformer_fpn_pixel_decoder(rng):
    model = MaskFormer(num_classes=5, hidden_dim=64, num_queries=8, nheads=4,
                       dim_feedforward=128, dec_layers=3, mask_dim=64,
                       pixel_decoder="fpn")
    img = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, img, train=False)
    out = model.apply(v, img, train=False)
    assert "pred_logits_ood" in out


@pytest.mark.slow
def test_swin_backbone_shapes(rng):
    cfg = dict(SWIN_CONFIGS["tiny"])
    cfg["depths"] = (1, 1, 2, 1)
    model = SwinTransformer(**cfg)
    x = jnp.zeros((1, 64, 96, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    feats = model.apply(v, x, train=False)
    assert feats["res2"].shape == (1, 16, 24, 96)
    assert feats["res5"].shape == (1, 2, 3, 768)


def test_panoptic_inference_merges_stuff(rng):
    q, k, h, w = 6, 5, 16, 16
    cls = np.full((q, k + 1), -5.0, np.float32)
    masks = np.full((q, h, w), -10.0, np.float32)
    # two confident queries of the same stuff class covering different halves
    cls[0, 2] = cls[1, 2] = 10.0
    masks[0, :, :8] = 10.0
    masks[1, :, 8:] = 10.0
    seg, info = panoptic_inference(cls, masks, thing_ids={4})
    assert len(info) == 1  # merged into one stuff segment
    assert (seg[:, :8] == info[0]["id"]).all() and (seg[:, 8:] == info[0]["id"]).all()


def test_instance_inference_topk(rng):
    q, k, h, w = 4, 3, 8, 8
    cls = rng.randn(q, k + 1).astype(np.float32)
    masks = rng.randn(q, h, w).astype(np.float32)
    out = instance_inference(cls, masks, test_topk_per_image=5)
    assert out["pred_masks"].shape[0] == 5
    assert out["scores"].shape == (5,)
    assert ((out["pred_masks"] == 0) | (out["pred_masks"] == 1)).all()


def test_hflip_tta_symmetric(rng):
    """For a flip-equivariant forward, TTA must be a no-op."""
    def fwd(img):
        return jnp.broadcast_to(jnp.mean(img, axis=-1, keepdims=True), img.shape[:3] + (4,)).transpose(0, 3, 1, 2)

    img = jnp.asarray(rng.randn(1, 8, 10, 3).astype(np.float32))
    out = hflip_tta(fwd, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fwd(img)), rtol=1e-6)


def test_maskformer_standard_predictor(rng):
    """MaskFormer-v1 wiring: the 'standard' predictor consumes the ENCODER
    feature (transformer_in_feature: transformer_encoder, mask_former_head.py:
    100-115) + mask features."""
    model = MaskFormer(num_classes=5, hidden_dim=64, num_queries=8, nheads=4,
                       dim_feedforward=128, dec_layers=3, mask_dim=64,
                       transformer_enc_layers=1,
                       pixel_decoder="transformer_encoder",
                       predictor="standard")
    img = jnp.zeros((1, 64, 128, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, img, train=False)
    out = model.apply(v, img, train=False)
    assert set(out) == {"pred_logits", "pred_masks", "aux_outputs"}
    assert out["pred_logits"].shape == (1, 8, 6)
    assert len(out["aux_outputs"]) == 2


def test_maskformer_unknown_predictor_raises(rng):
    """A typo'd decoder name must raise, not silently fall back to GMA."""
    import pytest as _pytest

    model = MaskFormer(num_classes=5, hidden_dim=64, num_queries=8, nheads=4,
                       dim_feedforward=128, dec_layers=3, mask_dim=64,
                       transformer_enc_layers=1, predictor="vanila")
    with _pytest.raises(ValueError, match="unknown predictor"):
        model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 3)), train=False)


def test_deepv3_generic_resnet_bn_trains(rng):
    """The closed-set DeepV3Plus baselines must TRAIN their ResNet trunk BN
    (the reference trains it; frozen-at-init stats are the M2F-backbone
    regime only): train=True updates the trunk's batch_stats."""
    from multishiftseg_tpu.models.deepv3_generic import DeepR50V3PlusD_m1

    model = DeepR50V3PlusD_m1(num_classes=5)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, updates = model.apply(v, x, train=True, mutable=["batch_stats"])
    before = v["batch_stats"]["trunk"]["stem_norm1"]["bn"]["mean"]
    after = updates["batch_stats"]["trunk"]["stem_norm1"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # eval path still uses running stats (no mutation requested)
    out2 = model.apply(v, x, train=False)
    assert np.isfinite(np.asarray(out2)).all()
