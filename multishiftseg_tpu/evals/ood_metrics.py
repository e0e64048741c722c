"""Pixel-level OOD detection metrics: AUROC, AUPRC (average precision), FPR@95TPR.

Exact numpy implementations (drop-in for the reference's sklearn-based
``lib/utils/metric.py:69-181``) plus an on-device histogram-binned JAX variant for fast
in-training validation, so the per-epoch metric pass does not round-trip tens of
millions of pixels through host numpy.

Conventions follow the reference: label 1 = OOD (positive), label 0 = in-distribution;
higher score = more anomalous.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy<2 / older jax name the trapezoidal rule `trapz`
_np_trapezoid = getattr(np, "trapezoid", getattr(np, "trapz", None))
_jnp_trapezoid = getattr(jnp, "trapezoid", getattr(jnp, "trapz", None))


def _threshold_counts(y_true: np.ndarray, y_score: np.ndarray):
    """Cumulative tp/fp at each distinct descending score threshold."""
    order = np.argsort(-y_score, kind="mergesort")
    y = y_true[order].astype(np.float64)
    s = y_score[order]
    distinct = np.where(np.diff(s))[0]
    idxs = np.r_[distinct, len(s) - 1]
    tps = np.cumsum(y)[idxs]
    fps = 1 + idxs - tps
    return tps, fps, s[idxs]


def auroc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Area under the ROC curve (trapezoid over distinct thresholds; ties handled as
    sklearn ``roc_auc_score``)."""
    tps, fps, _ = _threshold_counts(y_true, y_score)
    tps = np.r_[0.0, tps]
    fps = np.r_[0.0, fps]
    if tps[-1] == 0 or fps[-1] == 0:
        return float("nan")
    tpr = tps / tps[-1]
    fpr = fps / fps[-1]
    return float(_np_trapezoid(tpr, fpr))


def average_precision(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """AP = sum_n (R_n - R_{n-1}) P_n over descending thresholds (sklearn
    ``average_precision_score`` semantics)."""
    tps, fps, _ = _threshold_counts(y_true, y_score)
    if tps[-1] == 0:
        return float("nan")
    precision = tps / (tps + fps)
    recall = tps / tps[-1]
    recall_prev = np.r_[0.0, recall[:-1]]
    return float(np.sum((recall - recall_prev) * precision))


def fpr_at_recall(
    y_true: np.ndarray, y_score: np.ndarray, recall_level: float = 0.95
) -> float:
    """FPR at the threshold whose TPR is closest to ``recall_level``.

    Reproduces the cutoff-selection of the reference's ``fpr_and_fdr_at_recall``
    (``lib/utils/metric.py:87-127``): walk thresholds from the first one achieving full
    recall back to the most confident, append the (recall=1, fps=0) endpoint, and pick
    argmin |recall - level|.
    """
    tps, fps, _ = _threshold_counts(y_true, y_score)
    if tps[-1] == 0:
        return float("nan")
    recall = tps / tps[-1]
    last_ind = int(np.searchsorted(tps, tps[-1]))
    sl = slice(last_ind, None, -1)
    recall_r = np.r_[recall[sl], 1.0]
    fps_r = np.r_[fps[sl], 0.0]
    cutoff = int(np.argmin(np.abs(recall_r - recall_level)))
    n_neg = float(np.sum(y_true == 0))
    return float(fps_r[cutoff] / n_neg)


_NATIVE_MIN_PIXELS = 2_000_000  # below this, numpy's sort wins on dispatch overhead


def _native_ood_metrics(scores: np.ndarray, labels: np.ndarray,
                        recall_level: float) -> Optional[Tuple[float, float, float]]:
    """Threaded C++ sort+sweep core (``native/metrics.cc``) — the host-side hot
    spot of a final benchmark evaluation is a single-threaded sort over
    10^7..10^8 labelled pixels (the reference's sklearn path,
    ``lib/utils/metric.py:170-181``). Returns None when unavailable."""
    from ..data.native_io import get_named_lib

    lib = get_named_lib("libmssmetrics.so")
    if lib is None:
        return None
    import ctypes
    import os

    fn = lib.mss_ood_metrics
    fn.restype = ctypes.c_int
    s = np.ascontiguousarray(scores, np.float32)
    l = np.ascontiguousarray(labels, np.uint8)
    out = np.zeros(3, np.float64)
    rc = fn(
        s.ctypes.data_as(ctypes.c_void_p), l.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(s.size), ctypes.c_double(recall_level),
        ctypes.c_int(os.cpu_count() or 1),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return float(out[0]), float(out[1]), float(out[2])


def eval_ood_measure(
    conf: np.ndarray,
    seg_label: np.ndarray,
    train_id_in: int = 0,
    train_id_out: int = 1,
    recall_level: float = 0.95,
    use_native: Optional[bool] = None,
) -> Optional[Tuple[float, float, float]]:
    """(AUROC, AUPRC, FPR@95) over pixels labelled in/out; None if either set is empty.

    Signature-compatible with the reference ``eval_ood_measure``
    (``lib/utils/metric.py:170-181``). Pixels with other labels (e.g. 255 void) are
    excluded. Large inputs route through the threaded C++ core (same tie
    semantics; f32 score precision) unless ``use_native=False``.
    """
    conf = np.asarray(conf).reshape(-1)
    seg_label = np.asarray(seg_label).reshape(-1)
    mask = (seg_label == train_id_in) | (seg_label == train_id_out)
    if not mask.any():
        return None
    labels = (seg_label[mask] == train_id_out).astype(np.int64)
    if labels.sum() == 0 or labels.sum() == labels.size:
        return None
    if use_native or (use_native is None and mask.sum() >= _NATIVE_MIN_PIXELS):
        native = _native_ood_metrics(conf[mask], labels, recall_level)
        if native is not None:
            return native
    scores = conf[mask].astype(np.float64)
    return (
        auroc(labels, scores),
        average_precision(labels, scores),
        fpr_at_recall(labels, scores, recall_level),
    )


# ---------------------------------------------------------------------------
# On-device binned metrics (approximate; error ~ O(1/num_bins) of the score range).
# ---------------------------------------------------------------------------


def metrics_from_histograms(
    pos_hist: jax.Array, neg_hist: jax.Array, recall_level: float = 0.95
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(AUROC, AUPRC, FPR@recall) from descending-score-ordered count histograms.

    ``pos_hist[i]`` / ``neg_hist[i]`` count OOD / in-distribution pixels whose score
    fell in bin i (bin 0 = lowest score). Integer count histograms keep the
    cumsums exact (int32 holds 2^31 total pixels; float32 stops counting at 2^24).
    """
    tps = jnp.cumsum(pos_hist[::-1].astype(jnp.int32)).astype(jnp.float32)
    fps = jnp.cumsum(neg_hist[::-1].astype(jnp.int32)).astype(jnp.float32)
    p_total = jnp.maximum(tps[-1], 1.0)
    n_total = jnp.maximum(fps[-1], 1.0)
    tpr = jnp.concatenate([jnp.zeros(1, tps.dtype), tps]) / p_total
    fpr = jnp.concatenate([jnp.zeros(1, fps.dtype), fps]) / n_total
    auroc_v = _jnp_trapezoid(tpr, fpr)
    precision = tps / jnp.maximum(tps + fps, 1.0)
    recall = tps / p_total
    recall_prev = jnp.concatenate([jnp.zeros(1, recall.dtype), recall[:-1]])
    ap = jnp.sum((recall - recall_prev) * precision)
    reach = recall >= recall_level
    idx = jnp.argmax(reach)  # first True (0 if none; guarded below)
    fpr95 = jnp.where(jnp.any(reach), fps[idx] / n_total, jnp.float32(1.0))
    return auroc_v, ap, fpr95


@functools.partial(jax.jit, static_argnames=("num_bins",))
def _hist_update(pos_hist, neg_hist, scores, labels, lo, hi, num_bins: int):
    scores = scores.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1)
    span = jnp.maximum(hi - lo, 1e-12)
    bins = jnp.clip(((scores - lo) / span * num_bins).astype(jnp.int32), 0, num_bins - 1)
    pos = (labels == 1).astype(pos_hist.dtype)
    neg = (labels == 0).astype(neg_hist.dtype)
    return pos_hist.at[bins].add(pos), neg_hist.at[bins].add(neg)


@jax.jit
def _masked_min_max(scores, labels):
    scores = scores.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = (labels == 0) | (labels == 1)
    lo = jnp.where(valid, scores, jnp.inf).min()
    hi = jnp.where(valid, scores, -jnp.inf).max()
    return lo, hi


class BinnedOODMeter:
    """Streaming (AUROC, AUPRC, FPR@95) over many variable-size score maps with
    BOUNDED memory.

    Replaces the per-epoch host round-trip of full-resolution score maps through
    numpy/sklearn (the CPU hot spot of the reference's ``eval_ood_measure`` on
    N x 2048 x 1024 pixels, ``lib/utils/metric.py:170-181``, SURVEY §3.1):
    ``update`` reduces each map ON DEVICE to a per-map int32 histogram over the
    map's own score range and transfers only that (2 x num_bins ints + 2 range
    scalars, ~64 KB) to host — full-resolution maps are never retained, so HBM
    stays flat no matter how many images stream through. ``compute`` merges the
    per-map histograms into the global range on host (each source bin's count
    lands at its bin-center target bin) and finishes in float64.

    Accuracy is O(score_range / num_bins) — the per-map range is a subset of the
    global range, so rebinning adds at most half a source-bin width of error,
    the same order. Use for in-training validation; keep ``eval_ood_measure``
    for final reported numbers.
    """

    def __init__(self, num_bins: int = 8192, recall_level: float = 0.95):
        self.num_bins = num_bins
        self.recall_level = recall_level
        self._hists: list = []  # (pos [B] i64, neg [B] i64, lo, hi) on host

    def update(self, scores: jax.Array, labels) -> None:
        """scores: [...] device array; labels: [...] int (1=OOD, 0=in, other=void)."""
        scores = jnp.asarray(scores).reshape(-1)
        labels = jnp.asarray(np.asarray(labels).reshape(-1), jnp.int32)
        lo, hi = _masked_min_max(scores, labels)
        lo_f, hi_f = float(lo), float(hi)
        if not (np.isfinite(lo_f) and np.isfinite(hi_f)):
            return  # no valid pixels in this map
        pos = jnp.zeros(self.num_bins, jnp.int32)
        neg = jnp.zeros(self.num_bins, jnp.int32)
        pos, neg = _hist_update(pos, neg, scores, labels, lo, hi, self.num_bins)
        self._hists.append((np.asarray(pos, np.int64), np.asarray(neg, np.int64),
                            lo_f, hi_f))

    def compute(self) -> Optional[Tuple[float, float, float]]:
        if not self._hists:
            return None
        lo = min(h[2] for h in self._hists)
        hi = max(h[3] for h in self._hists)
        span = max(hi - lo, 1e-12)
        b = self.num_bins
        pos_hist = np.zeros(b, np.int64)
        neg_hist = np.zeros(b, np.int64)
        for pos, neg, lo_i, hi_i in self._hists:
            centers = lo_i + (np.arange(b) + 0.5) * max(hi_i - lo_i, 1e-12) / b
            tgt = np.clip(((centers - lo) / span * b).astype(np.int64), 0, b - 1)
            np.add.at(pos_hist, tgt, pos)
            np.add.at(neg_hist, tgt, neg)
        if pos_hist.sum() == 0 or neg_hist.sum() == 0:
            return None
        self._hists.clear()
        return _finish_histograms_np(pos_hist, neg_hist, self.recall_level)


def _finish_histograms_np(
    pos_hist: np.ndarray, neg_hist: np.ndarray, recall_level: float = 0.95
) -> Tuple[float, float, float]:
    """float64 host finish of :func:`metrics_from_histograms` (exact cumsums for
    billions of pixels; the device variant serves the single-shot jit path)."""
    tps = np.cumsum(pos_hist[::-1]).astype(np.float64)
    fps = np.cumsum(neg_hist[::-1]).astype(np.float64)
    p_total = max(tps[-1], 1.0)
    n_total = max(fps[-1], 1.0)
    tpr = np.concatenate([[0.0], tps]) / p_total
    fpr = np.concatenate([[0.0], fps]) / n_total
    auroc_v = _np_trapezoid(tpr, fpr)
    precision = tps / np.maximum(tps + fps, 1.0)
    recall = tps / p_total
    recall_prev = np.concatenate([[0.0], recall[:-1]])
    ap = np.sum((recall - recall_prev) * precision)
    reach = recall >= recall_level
    fpr95 = float(fps[np.argmax(reach)] / n_total) if reach.any() else 1.0
    return float(auroc_v), float(ap), float(fpr95)


def binned_ood_metrics(
    scores: jax.Array,
    labels: jax.Array,
    num_bins: int = 8192,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    recall_level: float = 0.95,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Histogram-binned (AUROC, AUPRC, FPR@recall) computed entirely on device.

    Args:
      scores: [...] anomaly scores (higher = more anomalous).
      labels: [...] int labels; 1 = OOD, 0 = in-distribution, others ignored.
    """
    scores = scores.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = (labels == 0) | (labels == 1)
    pos = (labels == 1) & valid
    neg = (labels == 0) & valid
    lo_v = jnp.where(valid, scores, jnp.inf).min() if lo is None else jnp.float32(lo)
    hi_v = jnp.where(valid, scores, -jnp.inf).max() if hi is None else jnp.float32(hi)
    span = jnp.maximum(hi_v - lo_v, 1e-12)
    bins = jnp.clip(
        ((scores - lo_v) / span * num_bins).astype(jnp.int32), 0, num_bins - 1
    )
    # int32 counts: exact to 2^31 pixels/bin (f32 would silently saturate at 2^24)
    pos_hist = jnp.zeros(num_bins, jnp.int32)
    neg_hist = jnp.zeros_like(pos_hist)
    pos_hist = pos_hist.at[bins].add(pos.astype(pos_hist.dtype))
    neg_hist = neg_hist.at[bins].add(neg.astype(neg_hist.dtype))
    return metrics_from_histograms(pos_hist, neg_hist, recall_level)
