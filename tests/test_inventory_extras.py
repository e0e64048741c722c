"""Coverage for the remaining reference-inventory components: MaskFormer-v1 decoder,
OOD-aware crop, ResNet-18/152 stage configs, colorize/seed utils, ADE20K source."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multishiftseg_tpu.data.transforms import RandCropIncludeOOD, Sample
from multishiftseg_tpu.models.maskformer_v1_decoder import StandardTransformerDecoder
from multishiftseg_tpu.models.resnet import ResNet
from multishiftseg_tpu.utils import map2citycolor, random_init


def test_standard_transformer_decoder(rng):
    dec = StandardTransformerDecoder(num_classes=5, hidden_dim=64, num_queries=8,
                                     nheads=4, dim_feedforward=128, dec_layers=2,
                                     mask_dim=32)
    x = jnp.asarray(rng.randn(1, 4, 6, 128).astype(np.float32))
    mf = jnp.asarray(rng.randn(1, 16, 24, 32).astype(np.float32))
    v = dec.init(jax.random.PRNGKey(0), x, mf)
    out = dec.apply(v, x, mf)
    assert out["pred_logits"].shape == (1, 8, 6)
    assert out["pred_masks"].shape == (1, 8, 16, 24)
    assert len(out["aux_outputs"]) == 1


@pytest.mark.parametrize("depth,chans", [(18, 512), (152, 2048)])
def test_resnet_depths(rng, depth, chans):
    model = ResNet(depth=depth)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(v, x)
    assert feats["res5"].shape == (1, 2, 2, chans)


def test_rand_crop_include_ood_keeps_anomaly(rng):
    g = np.random.default_rng(0)
    img = np.zeros((100, 120, 3), np.float32)
    mask = np.zeros((100, 120), np.int32)
    gen_img = np.zeros((100, 120, 3), np.float32)
    gen_mask = np.zeros((100, 120), np.int32)
    gen_mask[40:55, 60:80] = 254  # anomaly blob
    crop = RandCropIncludeOOD(size=(48, 48), prob=0.0)  # force full inclusion
    hits = 0
    for _ in range(10):
        s = crop(g, Sample(img.copy(), mask.copy(), gen_img.copy(), gen_mask.copy()))
        assert s.image.shape == (48, 48, 3)
        if ((s.gen_mask > 100) & (s.gen_mask < 255)).sum() == 15 * 20:
            hits += 1
    assert hits == 10  # full-inclusion mode always contains the whole object


def test_map2citycolor_and_seed():
    random_init(3)
    pred = np.zeros((4, 4), np.int64)
    pred[0, 0] = 0  # road
    pred[1, 1] = 10  # sky
    rgb = map2citycolor(pred)
    assert tuple(rgb[0, 0]) == (128, 64, 128)
    assert tuple(rgb[1, 1]) == (70, 130, 180)


def test_ade20k_source_with_synthetic_index(tmp_path, rng):
    import pickle
    from PIL import Image

    from multishiftseg_tpu.cgaug.ade20k_source import ADE20KAnomalySource
    from multishiftseg_tpu.cgaug.palettes import ADE20K_CLASSES

    # build a fake ADE20K layout: one image whose seg encodes a 'sofa' region
    root = tmp_path / "ADE"
    (root / "ADE20K_2021_17_01").mkdir(parents=True)
    (root / "images").mkdir()
    sofa_sem = ADE20K_CLASSES.index("sofa") + 1  # 1-based semantic id
    fine_id = 777
    seg = np.zeros((60, 80, 3), np.uint8)
    seg[20:40, 30:60, 0] = (fine_id // 256) * 10
    seg[20:40, 30:60, 1] = fine_id % 256
    Image.fromarray(seg).save(root / "images" / "img1_seg.png")
    index = {"filename": ["img1.jpg"], "folder": ["images"]}
    with open(root / "ADE20K_2021_17_01" / "index_ade20k.pkl", "wb") as f:
        pickle.dump(index, f)
    mapping_path = tmp_path / "mapping.pkl"
    with open(mapping_path, "wb") as f:
        pickle.dump({fine_id: sofa_sem, 0: 0}, f)

    src = ADE20KAnomalySource(str(root), class_mapping_path=str(mapping_path))
    mask, name = src.sample(np.random.default_rng(0))
    assert name == "sofa"
    assert mask.sum() == 20 * 30


def test_config_base_include_chain():
    """Swin experiment yamls inherit m2f.yaml through the base: include
    (detectron2 _BASE_ role)."""
    from multishiftseg_tpu.core.config import load_config

    cfg = load_config("/root/repo/exps/m2f_swin_large.yaml")
    assert cfg.model.m2f.backbone == "swin_large"
    assert cfg.train.warmup_epoch == 5  # inherited
    assert cfg.loss.params["mask2anomaly_loss_weight"]["mask_weight"] == 10.0
