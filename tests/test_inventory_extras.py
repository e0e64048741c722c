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


@pytest.mark.slow
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


def test_instance_panoptic_exp_configs_load(tmp_path, monkeypatch):
    """The D2 instance/panoptic yaml variants (reference configs/
    mask2former-cityscapes/{instance,panoptic}-segmentation/) load through the
    config tree with the reference's values and select the vanilla decoder."""
    monkeypatch.chdir(tmp_path)  # config snapshots land under cwd/ckpts/<id>
    from multishiftseg_tpu.core.config import load_config

    inst = load_config("/root/repo/exps/m2f_instance.yaml", exp_id="t_inst")
    m = inst.model.m2f
    assert m.num_classes == 8 and m.freeze_at == 0
    assert m.transformer_decoder == "vanilla"
    assert (m.semantic_on, m.instance_on, m.panoptic_on) == (False, True, False)
    assert (m.class_weight, m.mask_weight, m.dice_weight) == (2.0, 5.0, 5.0)
    assert m.base_lr == 1e-4 and m.object_mask_threshold == 0.8
    assert inst.model.mask2anomaly.mask_loss_with_pixel_selection is False
    assert inst.model.mask2anomaly.deep_supervision is True

    pan = load_config("/root/repo/exps/m2f_panoptic.yaml", exp_id="t_pan")
    assert pan.model.m2f.num_classes == 19
    assert (pan.model.m2f.semantic_on, pan.model.m2f.panoptic_on) == (True, True)

    swin = load_config("/root/repo/exps/m2f_panoptic_swin_large.yaml", exp_id="t_sl")
    assert swin.model.m2f.backbone == "swin_large"
    assert swin.model.m2f.num_classes == 19

    # the trainer maps these onto the MaskFormer module selections
    from multishiftseg_tpu.train.m2f_trainer import TrainM2FOOD

    inst.train.train_batch = 1
    trainer = TrainM2FOOD.__new__(TrainM2FOOD)  # no heavy init; just the mapping
    from multishiftseg_tpu.models.maskformer import MaskFormer

    mm = inst.model.m2f
    model = MaskFormer(
        num_classes=mm.num_classes, backbone=mm.backbone,
        predictor="vanilla" if mm.transformer_decoder == "vanilla" else "gma",
        pixel_decoder=mm.pixel_decoder,
    )
    assert model.predictor == "vanilla" and model.num_classes == 8


def test_scalar_writer_roundtrip(tmp_path):
    """ScalarWriter: the durable scalar-curve artifact standing in for the
    reference's (mostly unused) tensorboardX writer (train_deeplab.py:175)."""
    from multishiftseg_tpu.core.logging import ScalarWriter

    w = ScalarWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, 0)
    w.add_scalars({"train/loss": 1.25, "val/AUPRC": 0.5}, 1)
    w.close()
    # appends across writer instances (resume-safe)
    w2 = ScalarWriter(str(tmp_path))
    w2.add_scalar("train/loss", 1.0, 2)
    back = w2.read()
    w2.close()
    assert back["train/loss"] == [(0, 1.5), (1, 1.25), (2, 1.0)]
    assert back["val/AUPRC"] == [(1, 0.5)]
