"""Panoptic Quality protocol tests (evals/panoptic_metrics.py).

Hand-computable cases for every rule of the PQ protocol (match threshold, the
VOID-union correction, crowd/void FP removal, FN counting, class averaging),
plus a randomized cross-check against an independent brute-force mask-IoU
implementation of the same protocol, and the panoptic_inference -> PQ loop.
"""

import numpy as np
import pytest

from multishiftseg_tpu.evals.panoptic_metrics import (
    PanopticEvaluator, PQStat, panoptic_quality_stats, pq_averages,
    targets_to_panoptic)


def seg(*rows):
    return np.asarray(rows, np.int64)


def info(*entries):
    return [
        {"id": i, "category_id": c, "iscrowd": cr}
        for (i, c, cr) in entries
    ]


def test_perfect_prediction_is_pq_1():
    gt = seg([1, 1, 2, 2], [1, 1, 2, 2])
    st = panoptic_quality_stats(gt, info((1, 3, 0), (2, 7, 0)),
                                gt, info((1, 3, 0), (2, 7, 0)), 10)
    out = pq_averages(st)
    assert out["PQ"] == pytest.approx(1.0)
    assert out["SQ"] == pytest.approx(1.0)
    assert out["RQ"] == pytest.approx(1.0)
    assert out["n_classes"] == 2


def test_iou_exactly_half_is_not_a_match():
    # gt covers cols 0-1, pred covers cols 1-2: inter 2, union 6 -> IoU 1/3 < .5
    gt = seg([1, 1, 0, 0], [1, 1, 0, 0])
    pred = seg([0, 5, 5, 0], [0, 5, 5, 0])
    st = panoptic_quality_stats(pred, info((5, 2, 0)), gt, info((1, 2, 0)), 5)
    # the pred's overlap with VOID is 2/4 = exactly half -> still an FP
    assert st.tp[2] == 0 and st.fn[2] == 1 and st.fp[2] == 1
    assert pq_averages(st)["PQ"] == 0.0


def test_known_iou_value():
    # gt = 6 px, pred = 6 px, inter = 5; 1 pred px lies on VOID, so
    # union = 6 + 6 - 5 - 1 = 6 -> IoU 5/6
    gt = np.zeros((2, 6), np.int64)
    gt[:, :3] = 1
    pred = np.zeros((2, 6), np.int64)
    pred[0, :3] = 9
    pred[1, 1:4] = 9
    inter = int(((gt == 1) & (pred == 9)).sum())
    assert inter == 5
    st = panoptic_quality_stats(pred, info((9, 0, 0)), gt, info((1, 0, 0)), 3)
    assert st.tp[0] == 1
    assert st.iou[0] == pytest.approx(5 / 6)
    out = pq_averages(st)
    assert out["PQ"] == pytest.approx(5 / 6)
    assert out["SQ"] == pytest.approx(5 / 6)
    assert out["RQ"] == pytest.approx(1.0)


def test_void_union_correction():
    # pred overlaps gt by 3 and VOID by 3: union = 6 + 3 + ... without the
    # correction IoU = 3/9 = 1/3; with it union = 6+6-3-3 = 6 -> IoU 0.5... make
    # it clear a match only happens BECAUSE void overlap is excluded.
    gt = np.zeros((1, 10), np.int64)
    gt[0, :4] = 1          # gt area 4
    pred = np.zeros((1, 10), np.int64)
    pred[0, :3] = 2        # 3 px on gt
    pred[0, 4:7] = 2       # 3 px on void -> pred area 6
    st = panoptic_quality_stats(pred, info((2, 1, 0)), gt, info((1, 1, 0)), 3)
    # union = 6 + 4 - 3 - 3 = 4; IoU = 3/4 > 0.5 -> TP
    assert st.tp[1] == 1
    assert st.iou[1] == pytest.approx(3 / 4)


def test_unmatched_pred_mostly_void_is_not_fp():
    gt = np.zeros((1, 8), np.int64)           # all void
    pred = np.zeros((1, 8), np.int64)
    pred[0, :5] = 1
    st = panoptic_quality_stats(pred, info((1, 2, 0)), gt, [], 4)
    assert st.fp.sum() == 0
    # and a pred LESS than half covered by void IS an FP
    gt2 = np.zeros((1, 8), np.int64)
    gt2[0, :3] = 7                            # some other-class gt under it
    st2 = panoptic_quality_stats(pred, info((1, 2, 0)), gt2, info((7, 3, 0)), 4)
    assert st2.fp[2] == 1 and st2.fn[3] == 1


def test_crowd_gt_never_matches_and_absorbs_preds():
    gt = np.zeros((1, 8), np.int64)
    gt[0, :6] = 1
    crowd = info((1, 2, 1))
    pred = np.zeros((1, 8), np.int64)
    pred[0, :6] = 4
    # same class, IoU 1.0 — but crowd: no TP, no FN, and the pred is absorbed
    st = panoptic_quality_stats(pred, info((4, 2, 0)), gt, crowd, 4)
    assert st.tp.sum() == 0 and st.fn.sum() == 0 and st.fp.sum() == 0
    # different-class pred over the crowd is NOT absorbed -> FP
    st2 = panoptic_quality_stats(pred, info((4, 3, 0)), gt, crowd, 4)
    assert st2.fp[3] == 1


def test_wrong_class_is_fp_plus_fn():
    gt = seg([1, 1, 1, 1])
    pred = seg([6, 6, 6, 6])
    st = panoptic_quality_stats(pred, info((6, 2, 0)), gt, info((1, 1, 0)), 4)
    assert st.fn[1] == 1 and st.fp[2] == 1 and st.tp.sum() == 0
    out = pq_averages(st)
    assert out["PQ"] == 0.0 and out["n_classes"] == 2


def test_class_averaging_and_splits():
    # class 0 (stuff): perfect; class 2 (thing): FN only
    gt = seg([1, 1, 2, 2])
    pred = seg([1, 1, 0, 0])
    st = panoptic_quality_stats(pred, info((1, 0, 0)), gt,
                                info((1, 0, 0), (2, 2, 0)), 4)
    out = pq_averages(st, thing_ids={2, 3})
    assert out["PQ"] == pytest.approx(0.5)   # mean(1.0, 0.0)
    assert out["PQ_st"] == pytest.approx(1.0)
    assert out["PQ_th"] == pytest.approx(0.0)
    assert np.isnan(out["PQ_per_class"][1])  # class 1 absent entirely


def test_evaluator_accumulates_across_images():
    ev = PanopticEvaluator(num_classes=3)
    g1 = seg([1, 1, 1, 1])
    ev.process(g1, info((1, 0, 0)), g1, info((1, 0, 0)))
    g2 = seg([2, 2, 2, 2])
    ev.process(seg([0, 0, 0, 0]) + 9, info((9, 1, 0)), g2, info((2, 0, 0)))
    out = ev.evaluate()
    # class 0: one TP (iou 1), one FN; class 1: one FP
    assert out["PQ"] == pytest.approx(np.mean([1.0 / (1 + 0.5), 0.0]))
    ev.reset()
    assert ev.evaluate() is None


def test_targets_to_panoptic_roundtrip():
    id_map = np.asarray([[0, 0, -1], [1, 1, -1]], np.int32)
    classes = np.asarray([4, 7, -1, -1], np.int64)  # padded slots
    gt_seg, gt_info = targets_to_panoptic(id_map, classes)
    assert gt_seg.tolist() == [[1, 1, 0], [2, 2, 0]]
    assert gt_info == [{"id": 1, "category_id": 4, "iscrowd": 0},
                       {"id": 2, "category_id": 7, "iscrowd": 0}]


# ---------------------------------------------------------------------------
# randomized cross-check vs an independent brute-force implementation
# ---------------------------------------------------------------------------


def _brute_force_stats(pred_seg, pred_info, gt_seg, gt_info, num_classes):
    """Protocol re-derived with explicit boolean masks (O(P*G) pairs)."""
    st = PQStat(num_classes)
    void_mask = gt_seg == 0
    matched_g, matched_p = set(), set()
    for g in gt_info:
        if g.get("iscrowd", 0):
            continue
        gm = gt_seg == g["id"]
        for p in pred_info:
            if p["category_id"] != g["category_id"]:
                continue
            pm = pred_seg == p["id"]
            inter = int((gm & pm).sum())
            if inter == 0:
                continue
            union = int(gm.sum()) + int(pm.sum()) - inter - int(
                (pm & void_mask).sum())
            iou = inter / union
            if iou > 0.5:
                st.tp[g["category_id"]] += 1
                st.iou[g["category_id"]] += iou
                matched_g.add(g["id"])
                matched_p.add(p["id"])
    for g in gt_info:
        if g.get("iscrowd", 0) or g["id"] in matched_g:
            continue
        if int((gt_seg == g["id"]).sum()) == 0:
            continue
        st.fn[g["category_id"]] += 1
    for p in pred_info:
        if p["id"] in matched_p:
            continue
        pm = pred_seg == p["id"]
        area = int(pm.sum())
        if area == 0:
            continue
        ignored = int((pm & void_mask).sum())
        for g in gt_info:
            if g.get("iscrowd", 0) and g["category_id"] == p["category_id"]:
                ignored += int((pm & (gt_seg == g["id"])).sum())
        if ignored / area > 0.5:
            continue
        st.fp[p["category_id"]] += 1
    return st


def test_randomized_vs_brute_force():
    rng = np.random.RandomState(0)
    for trial in range(8):
        h, w, nc = 24, 32, 6
        n_gt, n_pred = rng.randint(1, 9), rng.randint(1, 9)
        # voronoi-ish random segmentations: nearest of k random centers
        def random_seg(k):
            cy = rng.randint(0, h, k)
            cx = rng.randint(0, w, k)
            yy, xx = np.mgrid[0:h, 0:w]
            d = (yy[..., None] - cy) ** 2 + (xx[..., None] - cx) ** 2
            lab = d.argmin(-1) + 1
            # random void holes
            lab[rng.rand(h, w) < 0.15] = 0
            return lab.astype(np.int64)

        gt_seg = random_seg(n_gt)
        pred_seg = random_seg(n_pred)
        gt_info = [{"id": i + 1, "category_id": int(rng.randint(nc)),
                    "iscrowd": int(rng.rand() < 0.2)} for i in range(n_gt)]
        pred_info = [{"id": i + 1, "category_id": int(rng.randint(nc)),
                      "iscrowd": 0} for i in range(n_pred)]
        a = panoptic_quality_stats(pred_seg, pred_info, gt_seg, gt_info, nc)
        b = _brute_force_stats(pred_seg, pred_info, gt_seg, gt_info, nc)
        np.testing.assert_array_equal(a.tp, b.tp, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(a.fp, b.fp, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(a.fn, b.fn, err_msg=f"trial {trial}")
        np.testing.assert_allclose(a.iou, b.iou, err_msg=f"trial {trial}")


def test_panoptic_inference_to_pq_loop():
    """panoptic_inference output feeds PQ directly: build query logits that
    reproduce a known 2-segment layout and check PQ == 1 against the same gt."""
    from multishiftseg_tpu.models.inference_extras import panoptic_inference

    h, w, q, k = 8, 8, 4, 5  # 5 classes total (k+1 logits with no-object)
    mask_pred = np.full((q, h, w), -10.0, np.float32)
    mask_pred[0, :, :4] = 10.0      # query 0: left half
    mask_pred[1, :, 4:] = 10.0      # query 1: right half
    mask_cls = np.full((q, k + 1), -10.0, np.float32)
    mask_cls[0, 2] = 10.0           # class 2 (stuff under our split)
    mask_cls[1, 3] = 10.0           # class 3 (thing)
    mask_cls[2, k] = 10.0           # no-object
    mask_cls[3, k] = 10.0
    pan_seg, seg_info = panoptic_inference(mask_cls, mask_pred, thing_ids={3})
    assert len(seg_info) == 2

    gt = np.zeros((h, w), np.int64)
    gt[:, :4] = 1
    gt[:, 4:] = 2
    gt_info = [{"id": 1, "category_id": 2, "iscrowd": 0},
               {"id": 2, "category_id": 3, "iscrowd": 0}]
    ev = PanopticEvaluator(num_classes=k, thing_ids={3})
    ev.process(pan_seg, seg_info, gt, gt_info)
    out = ev.evaluate()
    assert out["PQ"] == pytest.approx(1.0)
    assert out["PQ_th"] == pytest.approx(1.0)
    assert out["PQ_st"] == pytest.approx(1.0)
