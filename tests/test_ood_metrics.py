"""OOD metrics vs sklearn + the reference FPR@95 semantics on synthetic scores."""

import numpy as np
import pytest
import sklearn.metrics as sk

from multishiftseg_tpu.evals import ood_metrics as M


def _synthetic(rng, n=5000, ties=False):
    labels = (rng.rand(n) < 0.3).astype(np.int64)
    scores = rng.randn(n) + 1.5 * labels
    if ties:
        scores = np.round(scores, 1)  # force many tied scores
    return labels, scores


@pytest.mark.parametrize("ties", [False, True])
def test_auroc_ap_match_sklearn(rng, ties):
    labels, scores = _synthetic(rng, ties=ties)
    assert M.auroc(labels, scores) == pytest.approx(
        sk.roc_auc_score(labels, scores), abs=1e-10
    )
    assert M.average_precision(labels, scores) == pytest.approx(
        sk.average_precision_score(labels, scores), abs=1e-10
    )


def _reference_fpr_at_recall(y_true, y_score, recall_level=0.95):
    """Independent re-derivation of the reference algorithm (lib/utils/metric.py:87-127)
    used as a semantics oracle."""
    y_true = y_true == 1
    order = np.argsort(y_score, kind="mergesort")[::-1]
    y_score, y_true = y_score[order], y_true[order]
    distinct = np.where(np.diff(y_score))[0]
    idxs = np.r_[distinct, y_true.size - 1]
    tps = np.cumsum(y_true)[idxs]
    fps = 1 + idxs - tps
    recall = tps / tps[-1]
    last_ind = tps.searchsorted(tps[-1])
    sl = slice(last_ind, None, -1)
    recall, fps = np.r_[recall[sl], 1], np.r_[fps[sl], 0]
    cutoff = np.argmin(np.abs(recall - recall_level))
    return fps[cutoff] / np.sum(~y_true)


@pytest.mark.parametrize("ties", [False, True])
def test_fpr95_matches_reference_semantics(rng, ties):
    labels, scores = _synthetic(rng, ties=ties)
    assert M.fpr_at_recall(labels, scores) == pytest.approx(
        _reference_fpr_at_recall(labels, scores), abs=1e-12
    )


def test_eval_ood_measure_filters_void(rng):
    labels, scores = _synthetic(rng)
    seg = labels.copy()
    seg[:100] = 255  # void pixels must be excluded
    out = M.eval_ood_measure(scores, seg)
    assert out is not None
    a, p, f = out
    keep = seg != 255
    assert a == pytest.approx(sk.roc_auc_score(labels[keep], scores[keep]), abs=1e-10)
    assert 0 <= f <= 1 and 0 <= p <= 1


def test_eval_ood_measure_degenerate():
    assert M.eval_ood_measure(np.ones(10), np.zeros(10)) is None
    assert M.eval_ood_measure(np.ones(10), np.full(10, 255)) is None


def test_binned_metrics_close_to_exact(rng):
    import jax.numpy as jnp

    labels, scores = _synthetic(rng, n=20000)
    seg = labels.copy()
    seg[:50] = 255
    a, p, f = M.binned_ood_metrics(jnp.asarray(scores), jnp.asarray(seg), num_bins=16384)
    keep = seg != 255
    assert float(a) == pytest.approx(sk.roc_auc_score(labels[keep], scores[keep]), abs=2e-3)
    assert float(p) == pytest.approx(
        sk.average_precision_score(labels[keep], scores[keep]), abs=3e-3
    )
    assert float(f) == pytest.approx(
        _reference_fpr_at_recall(labels[keep], scores[keep]), abs=5e-3
    )


def test_binned_meter_streaming_matches_exact(rng):
    """BinnedOODMeter (streaming, per-image chunks, device-side) agrees with the exact
    host-side eval_ood_measure — the trainer valid() path is the binned one."""
    import jax.numpy as jnp

    labels, scores = _synthetic(rng, n=30000)
    seg = labels.copy()
    seg[::17] = 255  # void pixels excluded
    exact = M.eval_ood_measure(scores, seg)
    meter = M.BinnedOODMeter(num_bins=16384)
    for s in range(0, len(scores), 7000):  # variable-size "images"
        meter.update(jnp.asarray(scores[s : s + 7000]), seg[s : s + 7000])
    binned = meter.compute()
    assert binned is not None
    assert binned[0] == pytest.approx(exact[0], abs=2e-3)
    assert binned[1] == pytest.approx(exact[1], abs=3e-3)
    assert binned[2] == pytest.approx(exact[2], abs=5e-3)
    # meter resets after compute
    assert meter.compute() is None


def test_binned_meter_degenerate():
    import jax.numpy as jnp

    meter = M.BinnedOODMeter()
    assert meter.compute() is None
    meter.update(jnp.ones(10), np.zeros(10, np.int32))  # no positives
    assert meter.compute() is None
    meter = M.BinnedOODMeter()
    meter.update(jnp.ones(10), np.full(10, 255, np.int32))  # all void
    assert meter.compute() is None


def test_native_metrics_matches_python(rng):
    """The threaded C++ core (native/metrics.cc) agrees with the exact python
    implementation (incl. tie collapsing) to f32 score precision."""
    from multishiftseg_tpu.data.native_io import get_named_lib

    if get_named_lib("libmssmetrics.so") is None:
        pytest.skip("native toolchain unavailable")
    for ties in (False, True):
        labels, scores = _synthetic(rng, n=60000, ties=ties)
        scores = scores.astype(np.float32).astype(np.float64)  # equalize precision
        seg = labels.copy()
        seg[::13] = 255
        py = M.eval_ood_measure(scores, seg, use_native=False)
        nat = M.eval_ood_measure(scores, seg, use_native=True)
        assert nat is not None
        for a, b in zip(nat, py):
            assert a == pytest.approx(b, abs=1e-9)


def test_native_metrics_degenerate():
    from multishiftseg_tpu.data.native_io import get_named_lib

    if get_named_lib("libmssmetrics.so") is None:
        pytest.skip("native toolchain unavailable")
    # single-class input -> None via the python guard before the native call
    assert M.eval_ood_measure(np.ones(10), np.zeros(10), use_native=True) is None
