"""Production instance/panoptic training path: exps/m2f_instance.yaml ->
TrainM2FInstance -> registry walk -> mappers -> set_criterion_instance, e2e on
synthetic Cityscapes-layout instance data (closing the config-family loop the
reference leaves unwired — its instance/panoptic yamls have no entry point)."""

import numpy as np
import pytest
from PIL import Image

from multishiftseg_tpu.core.config import load_config


@pytest.fixture
def fake_instance_data(tmp_path):
    rng = np.random.RandomState(0)
    city = tmp_path / "cityscapes"
    for split, i in [("train", 0), ("train", 1), ("train", 2), ("train", 3),
                     ("val", 0), ("val", 1)]:
        stem = f"aachen_{i:06d}_000019"
        ip = city / "leftImg8bit" / split / "aachen" / f"{stem}_leftImg8bit.png"
        lp = city / "gtFine" / split / "aachen" / f"{stem}_gtFine_instanceIds.png"
        ip.parent.mkdir(parents=True, exist_ok=True)
        lp.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray((rng.rand(96, 96, 3) * 255).astype(np.uint8)).save(ip)
        # cityscapes instanceIds encoding: stuff = RAW class id, things =
        # raw_class*1000 + n (person=24, car=26 -> contiguous thing ids 0, 2)
        inst = np.full((96, 96), 7, np.int32)  # road (stuff)
        inst[10:40, 10:40] = 24 * 1000 + 0     # person 0
        inst[50:80, 15:45] = 24 * 1000 + 1     # person 1 (duplicate class)
        inst[20:60, 60:90] = 26 * 1000 + 0     # car
        Image.fromarray(inst.astype(np.uint16)).save(lp)  # 16-bit png like gtFine
    return str(city)


def test_clip_targets_keeps_largest():
    from multishiftseg_tpu.data.mappers import SegmentTargets
    from multishiftseg_tpu.train.instance_trainer import clip_targets

    id_map = -np.ones((10, 10), np.int32)
    id_map[:5] = 0       # 50 px
    id_map[5:6] = 1      # 10 px (smallest -> dropped)
    id_map[6:9] = 2      # 30 px
    tgt = SegmentTargets(id_map, np.array([3, 4, 5], np.int64),
                         np.ones(3, bool))
    out = clip_targets(tgt, 2)
    assert list(out.classes) == [3, 5]
    assert set(np.unique(out.id_map)) == {-1, 0, 1}
    assert (out.id_map[5:6] == -1).all()  # dropped segment -> ignore
    assert (out.id_map[6:9] == 1).all()   # renumbered


@pytest.mark.slow
def test_instance_trainer_e2e(fake_instance_data, tmp_path, monkeypatch):
    from multishiftseg_tpu.data.registry import DatasetCatalog
    from multishiftseg_tpu.models.maskformer import MaskFormer
    from multishiftseg_tpu.train.instance_trainer import TrainM2FInstance

    monkeypatch.chdir(tmp_path)
    DatasetCatalog.remove("cityscapes_instance_train")
    cfg = load_config("/root/repo/exps/m2f_instance.yaml", exp_id="inst_test")
    cfg.data.cityscapes_root = fake_instance_data
    cfg.data.crop_size = (64, 64)
    cfg.train.n_epochs = 1
    cfg.train.train_batch = 2
    cfg.train.bf16 = False
    cfg.data.num_workers = 2
    cfg.model.m2f.max_instances = 8

    m = cfg.model.m2f
    assert m.instance_on and not m.semantic_on  # the yaml selects this trainer
    assert m.ood_loss == "none"
    model = MaskFormer(num_classes=m.num_classes, hidden_dim=32, num_queries=12,
                       nheads=4, dim_feedforward=64, dec_layers=3, mask_dim=32,
                       transformer_enc_layers=1, predictor=m.transformer_decoder)
    trainer = TrainM2FInstance(cfg, model=model)
    assert trainer.crit_cfg.num_classes == 8
    result = trainer.train()
    assert np.isfinite(result["loss"])
    assert trainer.ckpt.exists("last")

    # instance AP evaluation end-to-end over the val split (model ->
    # instance_inference -> COCO evaluator); random init, so only sanity-check
    from multishiftseg_tpu.data.registry import DatasetCatalog as _DC
    _DC.remove("cityscapes_instance_val")
    ap = trainer.evaluate(max_images=2)
    assert ap is not None and set(ap) >= {"AP", "AP50", "AP75"}
    assert np.isnan(ap["AP"]) or 0.0 <= ap["AP"] <= 1.0

    # duplicate-class targets really flow through, with the raw->contiguous
    # class map applied (person raw 24 -> contiguous 0, car raw 26 -> 2)
    ds = trainer.build_dataset()
    img, id_map, classes = ds[0]
    present = classes[classes >= 0]
    assert set(present) <= {0, 2}
    assert len(present) >= 1  # at least one thing survives the crop
    assert img.shape == (64, 64, 3) and id_map.shape == (64, 64)
    assert classes.shape == (8,)


@pytest.fixture
def fake_panoptic_data(tmp_path):
    """Cityscapes panoptic layout: RGB-id pngs + cityscapes_panoptic_train.json."""
    import json

    rng = np.random.RandomState(1)
    city = tmp_path / "cityscapes"
    img_dir = city / "leftImg8bit" / "train" / "aachen"
    pan_dir = city / "gtFine" / "cityscapes_panoptic_train"
    img_dir.mkdir(parents=True)
    pan_dir.mkdir(parents=True)
    images, annotations = [], []
    for i in range(4):
        stem = f"aachen_{i:06d}_000019"
        Image.fromarray((rng.rand(96, 96, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{stem}_leftImg8bit.png")
        # segments: road (raw 7 -> trainId 0), person x2 (raw 24 -> trainId 11)
        pan = np.zeros((96, 96), np.int64)
        pan[:] = 1
        pan[10:40, 10:40] = 2
        pan[50:80, 15:45] = 3
        rgb = np.stack([pan % 256, pan // 256 % 256, pan // 65536],
                       -1).astype(np.uint8)
        Image.fromarray(rgb).save(pan_dir / f"{stem}_gtFine_panoptic.png")
        images.append({"id": i, "file_name": f"{stem}_leftImg8bit.png"})
        annotations.append({
            "image_id": i, "file_name": f"{stem}_gtFine_panoptic.png",
            "segments_info": [
                {"id": 1, "category_id": 7, "iscrowd": 0},
                {"id": 2, "category_id": 24, "iscrowd": 0},
                {"id": 3, "category_id": 24, "iscrowd": 0},
            ],
        })
    with open(city / "gtFine" / "cityscapes_panoptic_train.json", "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    return str(city)


@pytest.mark.slow
def test_panoptic_trainer_e2e(fake_panoptic_data, tmp_path, monkeypatch):
    from multishiftseg_tpu.data.registry import DatasetCatalog
    from multishiftseg_tpu.models.maskformer import MaskFormer
    from multishiftseg_tpu.train.instance_trainer import TrainM2FInstance

    monkeypatch.chdir(tmp_path)
    DatasetCatalog.remove("cityscapes_panoptic_train")
    cfg = load_config("/root/repo/exps/m2f_panoptic.yaml", exp_id="pan_test")
    cfg.data.cityscapes_root = fake_panoptic_data
    cfg.data.crop_size = (64, 64)
    cfg.train.n_epochs = 1
    cfg.train.train_batch = 2
    cfg.train.bf16 = False
    cfg.data.num_workers = 2
    cfg.model.m2f.max_instances = 8

    m = cfg.model.m2f
    assert m.panoptic_on and m.num_classes == 19
    model = MaskFormer(num_classes=m.num_classes, hidden_dim=32, num_queries=12,
                       nheads=4, dim_feedforward=64, dec_layers=3, mask_dim=32,
                       transformer_enc_layers=1, predictor=m.transformer_decoder)
    trainer = TrainM2FInstance(cfg, model=model)
    assert trainer.task == "panoptic"
    result = trainer.train()
    assert np.isfinite(result["loss"])

    # panoptic evaluation end-to-end: instance AP (things) + PQ/SQ/RQ with
    # things/stuff splits (panoptic_inference -> PanopticEvaluator); random
    # init, so only protocol sanity — gt classes are road (stuff) + person
    # (thing), so both splits are populated
    pq = trainer.evaluate(dataset_name="cityscapes_panoptic_train",
                          max_images=2)
    assert pq is not None
    assert {"AP", "PQ", "SQ", "RQ", "PQ_th", "PQ_st", "n_classes"} <= set(pq)
    assert 0.0 <= pq["PQ"] <= 1.0 and pq["n_classes"] >= 2

    # class map applied: raw 7 -> trainId 0 (road), raw 24 -> trainId 11 (person,
    # duplicated); thing flags from the raw thing ids
    ds = trainer.build_dataset()
    img, id_map, classes = ds[0]
    present = sorted(classes[classes >= 0])
    assert set(present) <= {0, 11}
    assert img.shape == (64, 64, 3) and classes.shape == (8,)


@pytest.fixture
def fake_semantic_data(tmp_path):
    """Cityscapes semantic layout: leftImg8bit pngs + gtFine labelTrainIds."""
    rng = np.random.RandomState(2)
    city = tmp_path / "cityscapes"
    for split, n in (("train", 4), ("val", 2)):
        img_dir = city / "leftImg8bit" / split / "aachen"
        lab_dir = city / "gtFine" / split / "aachen"
        img_dir.mkdir(parents=True)
        lab_dir.mkdir(parents=True)
        for i in range(n):
            stem = f"aachen_{i:06d}_000019"
            Image.fromarray((rng.rand(96, 96, 3) * 255).astype(np.uint8)).save(
                img_dir / f"{stem}_leftImg8bit.png")
            lab = rng.randint(0, 5, (96, 96)).astype(np.uint8)
            lab[:10] = 255  # ignore band
            Image.fromarray(lab).save(
                lab_dir / f"{stem}_gtFine_labelTrainIds.png")
    return str(city)


@pytest.mark.slow
def test_semantic_trainer_e2e(fake_semantic_data, tmp_path, monkeypatch):
    """Vanilla semantic M2F (the reference's maskformer2_R50_bs16_90k family,
    unwired there): ood_finetune False routes to TrainM2FInstance in the
    semantic task — one segment per present class, plain loss_masks — and
    evaluate() reports mIoU over the val split."""
    from multishiftseg_tpu.data.registry import DatasetCatalog
    from multishiftseg_tpu.models.maskformer import MaskFormer
    from multishiftseg_tpu.train.instance_trainer import TrainM2FInstance

    monkeypatch.chdir(tmp_path)
    for split in ("train", "val"):
        DatasetCatalog.remove(f"cityscapes_semantic_{split}")
    cfg = load_config("/root/repo/exps/m2f_semantic.yaml", exp_id="sem_test")
    cfg.data.cityscapes_root = fake_semantic_data
    cfg.data.crop_size = (64, 64)
    cfg.train.n_epochs = 1
    cfg.train.train_batch = 2
    cfg.train.bf16 = False
    cfg.data.num_workers = 2
    cfg.model.m2f.max_instances = 8  # padded T must stay <= the tiny model's Q

    m = cfg.model.m2f
    # the cli routing condition for the vanilla semantic family
    assert m.semantic_on and not m.instance_on and not m.panoptic_on
    assert not m.ood_finetune and m.num_classes == 19
    model = MaskFormer(num_classes=m.num_classes, hidden_dim=32, num_queries=12,
                       nheads=4, dim_feedforward=64, dec_layers=3, mask_dim=32,
                       transformer_enc_layers=1, predictor=m.transformer_decoder)
    trainer = TrainM2FInstance(cfg, model=model)
    assert trainer.task == "semantic"

    # dataset emits one segment per present class, ignore band excluded
    ds = trainer.build_dataset()
    img, id_map, classes = ds[0]
    present = classes[classes >= 0]
    assert 1 <= len(present) <= 5 and len(set(present)) == len(present)
    assert img.shape == (64, 64, 3)

    result = trainer.train()
    assert np.isfinite(result["loss"])

    miou = trainer.evaluate(max_images=2)
    assert miou is not None and set(miou) >= {"mIoU", "pixel_acc"}
    assert 0.0 <= miou["pixel_acc"] <= 1.0
    assert np.isnan(miou["mIoU"]) or 0.0 <= miou["mIoU"] <= 1.0


def test_drop_empty_segments():
    from multishiftseg_tpu.data.mappers import SegmentTargets
    from multishiftseg_tpu.train.instance_trainer import drop_empty_segments

    id_map = -np.ones((8, 8), np.int32)
    id_map[:4] = 0
    id_map[4:] = 2  # segment 1 was cropped away entirely
    tgt = SegmentTargets(id_map, np.array([5, 6, 7], np.int64),
                         np.array([True, False, True]))
    out = drop_empty_segments(tgt)
    assert list(out.classes) == [5, 7]
    assert (out.id_map[4:] == 1).all()  # renumbered


def test_checkpoint_restore_typed_roundtrips_optax_state(tmp_path):
    """restore_typed preserves optax NamedTuple structure (the plain restore
    returns raw dicts whose leaf order need not match the NamedTuple fields)."""
    import jax
    import jax.numpy as jnp
    import optax

    from multishiftseg_tpu.train.checkpoint import CheckpointManager

    params = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = tx.init(params)
    # advance one step so the moments are non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)

    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save("last", params=params, opt_state=opt_state, epoch=3)
    fresh = tx.init(params)
    restored = ckpt.restore_typed(
        "last", {"params": params, "opt_state": fresh, "epoch": 0})
    # structure preserved: the restored state drives another update
    _, _ = tx.update(grads, restored["opt_state"], restored["params"])
    lr = jax.tree_util.tree_leaves(restored["opt_state"])
    lo = jax.tree_util.tree_leaves(opt_state)
    assert all(np.allclose(a, b) for a, b in zip(lr, lo))
    assert int(restored["epoch"]) == 3
