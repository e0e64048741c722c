"""Instance AP evaluator (COCO protocol, hand-computed oracles), dataset mappers,
and the dataset catalog."""

import json

import numpy as np
import pytest
from PIL import Image

from multishiftseg_tpu.data import mappers as MP
from multishiftseg_tpu.data.registry import (
    DatasetCatalog, MetadataCatalog, register_instance_folder,
    register_panoptic_folder, register_semantic_folder,
)
from multishiftseg_tpu.evals.instance_metrics import (
    InstanceSegEvaluator, instance_ap, mask_iou_matrix,
)


def _box_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_mask_iou_matrix():
    a = np.stack([_box_mask(10, 10, 0, 5, 0, 10), _box_mask(10, 10, 0, 10, 0, 10)])
    b = np.stack([_box_mask(10, 10, 0, 5, 0, 10)])
    iou = mask_iou_matrix(a, b)
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[1, 0] == pytest.approx(0.5)


def test_instance_ap_perfect_predictions():
    gt = {"masks": np.stack([_box_mask(16, 16, 0, 8, 0, 8),
                             _box_mask(16, 16, 8, 16, 8, 16)]),
          "classes": np.asarray([0, 1])}
    pred = {"masks": gt["masks"].copy(), "scores": np.asarray([0.9, 0.8]),
            "classes": gt["classes"].copy()}
    res = instance_ap([pred], [gt], num_classes=2)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(1.0)


def test_instance_ap_half_recall():
    """One TP at rank 1, one missed GT: interpolated precision = 1 up to recall
    0.5, 0 beyond -> AP = (51/101) at every IoU threshold."""
    gt = {"masks": np.stack([_box_mask(16, 16, 0, 8, 0, 16),
                             _box_mask(16, 16, 8, 16, 0, 16)]),
          "classes": np.asarray([0, 0])}
    pred = {"masks": gt["masks"][:1].copy(), "scores": np.asarray([0.9]),
            "classes": np.asarray([0])}
    res = instance_ap([pred], [gt], num_classes=1)
    assert res["AP"] == pytest.approx(51 / 101)


def test_instance_ap_iou_threshold_cut():
    """A prediction with IoU 0.6 counts at thresholds <= 0.6 only ->
    AP50 = 1, AP75 = 0, AP = mean over 0.5:0.05:0.95 = 3/10 thresholds pass."""
    gt = {"masks": np.stack([_box_mask(10, 10, 0, 10, 0, 10)]),
          "classes": np.asarray([0])}
    pred = {"masks": np.stack([_box_mask(10, 10, 0, 6, 0, 10)]),
            "scores": np.asarray([0.9]), "classes": np.asarray([0])}
    res = instance_ap([pred], [gt], num_classes=1)
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(0.0)
    assert res["AP"] == pytest.approx(3 / 10)  # 0.50, 0.55, 0.60 pass


def test_instance_ap_false_positive_ranking():
    """FP ranked above the TP: precision at the TP is 1/2 ->
    interpolated AP = 0.5 * (51/101)... recall grid: p=0.5 for r<=1.0? GT=1:
    recall hits 1.0 at rank 2 with precision 0.5 -> AP = 0.5."""
    gt = {"masks": np.stack([_box_mask(10, 10, 0, 10, 0, 10)]),
          "classes": np.asarray([0])}
    pred = {"masks": np.stack([_box_mask(10, 10, 0, 2, 0, 2),
                               _box_mask(10, 10, 0, 10, 0, 10)]),
            "scores": np.asarray([0.9, 0.8]), "classes": np.asarray([0, 0])}
    res = instance_ap([pred], [gt], num_classes=1)
    assert res["AP50"] == pytest.approx(0.5)


def test_evaluator_accumulates_and_ignores_empty_classes():
    ev = InstanceSegEvaluator(num_classes=3)
    assert ev.evaluate() is None
    gt = {"masks": np.stack([_box_mask(8, 8, 0, 8, 0, 8)]),
          "classes": np.asarray([1])}
    pred = {"masks": gt["masks"].copy(), "scores": np.asarray([1.0]),
            "classes": np.asarray([1])}
    ev.process(pred, gt)
    res = ev.evaluate()
    assert res["AP"] == pytest.approx(1.0)  # classes without GT excluded (NaN)
    assert np.isnan(res["AP_per_class"][0]) and np.isnan(res["AP_per_class"][2])


# ---------------- mappers ----------------


def test_semantic_to_targets_roundtrip():
    sem = np.full((12, 12), 255, np.int64)
    sem[:6] = 3
    sem[6:, :6] = 7
    t = MP.semantic_to_targets(sem)
    assert sorted(t.classes.tolist()) == [3, 7]
    assert t.masks().shape == (2, 12, 12)
    np.testing.assert_array_equal(MP.targets_to_semantic(t), sem)


def test_panoptic_mapper_drops_crowd_and_maps_things():
    pan = np.zeros((8, 8), np.int64)
    pan[:4] = 5
    pan[4:] = 9
    pan[0, 0] = 77
    infos = [
        {"id": 5, "category_id": 2, "isthing": True},
        {"id": 9, "category_id": 11, "isthing": False},
        {"id": 77, "category_id": 1, "iscrowd": 1},
    ]
    t = MP.panoptic_to_targets(pan, infos)
    assert t.classes.tolist() == [2, 11]
    assert t.is_thing.tolist() == [True, False]
    assert t.id_map[0, 0] == -1  # crowd pixel unassigned


def test_rgb2id():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[0, 0] = (1, 2, 3)
    ids = MP.rgb2id(rgb)
    assert ids[0, 0] == 1 + 2 * 256 + 3 * 256 * 256


def test_instance_mapper_cityscapes_encoding():
    inst = np.zeros((10, 10), np.int64)
    inst[:5, :5] = 26001   # car instance 1
    inst[5:, 5:] = 26002   # car instance 2
    inst[0, 9] = 11        # stuff id < divisor -> excluded
    t = MP.instance_to_targets(inst)
    assert t.classes.tolist() == [26, 26]
    assert t.is_thing.all()
    assert (t.id_map >= 0).sum() == 50


def test_coco_annotations_mapper_and_padding():
    anns = [
        {"category_id": 4, "segmentation": _box_mask(6, 6, 0, 3, 0, 6)},
        {"category_id": 9, "segmentation": _box_mask(6, 6, 3, 6, 0, 6),
         "iscrowd": 1},
    ]
    t = MP.coco_annotations_to_targets(anns, (6, 6))
    assert t.classes.tolist() == [4]
    p = t.padded(5)
    assert p.classes.tolist() == [4, -1, -1, -1, -1]
    np.testing.assert_array_equal(
        MP.targets_to_semantic(p)[:3], np.full((3, 6), 4))


# ---------------- registry ----------------


def test_registry_semantic_and_instance(tmp_path):
    for name in ("t_sem", "t_inst", "t_pan"):
        DatasetCatalog.remove(name)
    img_dir = tmp_path / "img"
    lbl_dir = tmp_path / "lbl"
    for stem in ("a/x", "b/y"):
        p = img_dir / f"{stem}.jpg"
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.new("RGB", (4, 4)).save(p)
        q = lbl_dir / f"{stem}.png"
        q.parent.mkdir(parents=True, exist_ok=True)
        Image.new("L", (4, 4)).save(q)
    register_semantic_folder("t_sem", str(img_dir), str(lbl_dir),
                             class_names=["road", "car"])
    recs = DatasetCatalog.get("t_sem")
    assert len(recs) == 2 and all("sem_seg_file_name" in r for r in recs)
    assert MetadataCatalog.get("t_sem")["class_names"] == ["road", "car"]
    with pytest.raises(KeyError):
        register_semantic_folder("t_sem", str(img_dir), str(lbl_dir))

    inst_dir = tmp_path / "inst"
    ipath = img_dir / "c_leftImg8bit.png"
    Image.new("RGB", (4, 4)).save(ipath)
    q = inst_dir / "c_gtFine_instanceIds.png"
    q.parent.mkdir(parents=True, exist_ok=True)
    Image.new("I", (4, 4)).save(q)
    register_instance_folder("t_inst", str(img_dir), str(inst_dir))
    recs = DatasetCatalog.get("t_inst")
    assert len(recs) == 1 and "instance_file_name" in recs[0]


def test_registry_panoptic(tmp_path):
    DatasetCatalog.remove("t_pan")
    img_dir = tmp_path / "im"
    pan_dir = tmp_path / "pan"
    img_dir.mkdir()
    pan_dir.mkdir()
    Image.new("RGB", (4, 4)).save(img_dir / "0001.jpg")
    Image.new("RGB", (4, 4)).save(pan_dir / "0001.png")
    meta = {
        "images": [{"id": 1, "file_name": "0001.jpg"}],
        "annotations": [{
            "image_id": 1, "file_name": "0001.png",
            "segments_info": [{"id": 3, "category_id": 0}],
        }],
    }
    jpath = tmp_path / "pan.json"
    jpath.write_text(json.dumps(meta))
    register_panoptic_folder("t_pan", str(img_dir), str(pan_dir), str(jpath),
                             thing_ids=[0])
    recs = DatasetCatalog.get("t_pan")
    assert len(recs) == 1
    assert recs[0]["segments_info"][0]["id"] == 3
    assert "t_pan" in DatasetCatalog.list()


@pytest.mark.slow
def test_model_to_instance_ap_end_to_end():
    """The full instance path: vanilla-decoder MaskFormer forward ->
    instance_inference -> InstanceSegEvaluator, on a scene the model is
    teacher-forced to predict (weights crafted via one overfit step is overkill;
    instead craft the HEAD outputs through the real inference/eval plumbing and
    run the real model once to check shape compatibility)."""
    import jax
    import jax.numpy as jnp

    from multishiftseg_tpu.data.mappers import instance_to_targets
    from multishiftseg_tpu.evals.instance_metrics import InstanceSegEvaluator
    from multishiftseg_tpu.models.inference_extras import instance_inference
    from multishiftseg_tpu.models.maskformer import MaskFormer

    # real model forward for plumbing compatibility
    model = MaskFormer(num_classes=8, backbone="resnet50", hidden_dim=32,
                       num_queries=12, nheads=4, dim_feedforward=64,
                       dec_layers=3, mask_dim=32, transformer_enc_layers=1,
                       predictor="vanilla")
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, img, train=False)
    out = model.apply(variables, img, train=False)
    res = instance_inference(np.asarray(out["pred_logits"][0], np.float32),
                             np.asarray(out["pred_masks"][0], np.float32),
                             test_topk_per_image=10)
    assert res["pred_masks"].shape[1:] == out["pred_masks"].shape[2:]

    # teacher-forced head outputs through the same path -> perfect AP
    pan = np.zeros((32, 32), np.int64)
    pan[:, :10] = 2 * 1000 + 0
    pan[:, 20:] = 2 * 1000 + 1
    tgt = instance_to_targets(pan, divisor=1000)
    q, k = 6, 8
    cls = np.full((q, k + 1), -10.0, np.float32)
    msk = np.full((q, 32, 32), -10.0, np.float32)
    cls[:, k] = 5.0  # default no-object
    for t in range(len(tgt.classes)):
        cls[t, k] = -10.0
        cls[t, tgt.classes[t]] = 10.0
        msk[t][tgt.id_map == t] = 10.0
    pred = instance_inference(cls, msk, test_topk_per_image=5)
    ev = InstanceSegEvaluator(num_classes=k)
    ev.process(
        {"masks": pred["pred_masks"].astype(bool), "scores": pred["scores"],
         "classes": pred["pred_classes"]},
        {"masks": tgt.masks().astype(bool), "classes": tgt.classes},
    )
    res = ev.evaluate()
    assert res is not None and np.isfinite(res["AP"]) and res["AP"] > 0.9
