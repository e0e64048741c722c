// Native metrics core: threaded sort + threshold sweep for exact pixel-level
// OOD metrics (AUROC / average precision / FPR@recall).
//
// Role: the reference computes these with sklearn over every labelled pixel of a
// benchmark (lib/utils/metric.py:69-181) — at MUAD/ACDC scale that is a single-
// threaded sort over 10^7..10^8 (score, label) pairs and the dominant host cost of
// a final evaluation. This core does a parallel merge sort over index pairs and a
// single cumulative sweep with the exact tie semantics of the python
// implementation (evals/ood_metrics.py), exposed via ctypes (no pybind11).
//
// API (C):
//   int mss_ood_metrics(const float* scores, const uint8_t* labels, int64_t n,
//                       double recall_level, int threads, double* out3);
//     labels: 1 = OOD positive, 0 = in-distribution; other values must be
//     filtered out by the caller. out3 = {auroc, ap, fpr_at_recall}.
//     Returns 0 on success, nonzero when a class is empty.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Parallel stable sort of indices by descending score.
void parallel_sort_idx(const float* scores, std::vector<int64_t>& idx, int threads) {
  const int64_t n = static_cast<int64_t>(idx.size());
  auto cmp = [scores](int64_t a, int64_t b) {
    if (scores[a] != scores[b]) return scores[a] > scores[b];
    return a < b;  // stable tie order
  };
  if (threads <= 1 || n < (1 << 16)) {
    std::stable_sort(idx.begin(), idx.end(), cmp);
    return;
  }
  // chunk sort
  const int T = std::min<int64_t>(threads, 64);
  std::vector<std::pair<int64_t, int64_t>> ranges;
  const int64_t chunk = (n + T - 1) / T;
  {
    std::vector<std::thread> pool;
    for (int t = 0; t < T; ++t) {
      int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
      if (lo >= hi) break;
      ranges.emplace_back(lo, hi);
      pool.emplace_back([&, lo, hi] {
        std::stable_sort(idx.begin() + lo, idx.begin() + hi, cmp);
      });
    }
    for (auto& th : pool) th.join();
  }
  // pairwise merge
  while (ranges.size() > 1) {
    std::vector<std::pair<int64_t, int64_t>> next;
    std::vector<std::thread> pool;
    for (size_t i = 0; i + 1 < ranges.size(); i += 2) {
      auto a = ranges[i], b = ranges[i + 1];
      next.emplace_back(a.first, b.second);
      pool.emplace_back([&, a, b] {
        std::inplace_merge(idx.begin() + a.first, idx.begin() + b.first,
                           idx.begin() + b.second, cmp);
      });
    }
    if (ranges.size() % 2) next.push_back(ranges.back());
    for (auto& th : pool) th.join();
    ranges.swap(next);
  }
}

}  // namespace

extern "C" int mss_ood_metrics(const float* scores, const uint8_t* labels,
                               int64_t n, double recall_level, int threads,
                               double* out3) {
  if (n <= 0) return 1;
  // NaN scores (a diverged forward) would break the sort comparator's strict
  // weak ordering (UB in std::stable_sort) — refuse; the Python caller falls
  // back to the exact numpy path, whose behaviour with NaN is defined
  for (int64_t i = 0; i < n; ++i)
    if (std::isnan(scores[i])) return 2;
  std::vector<int64_t> idx(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = i;
  parallel_sort_idx(scores, idx, threads);

  // Cumulative tp/fp at each distinct descending threshold (ties collapse onto
  // the last index of the run, matching evals/ood_metrics.py::_threshold_counts).
  int64_t n_pos = 0;
  for (int64_t i = 0; i < n; ++i) n_pos += labels[i] ? 1 : 0;
  const int64_t n_neg = n - n_pos;
  if (n_pos == 0 || n_neg == 0) return 2;

  std::vector<double> tps, fps;
  tps.reserve(1 << 16);
  fps.reserve(1 << 16);
  double tp = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    tp += labels[idx[i]] ? 1.0 : 0.0;
    const bool distinct =
        (i + 1 == n) || (scores[idx[i]] != scores[idx[i + 1]]);
    if (distinct) {
      tps.push_back(tp);
      fps.push_back(static_cast<double>(i + 1) - tp);
    }
  }
  const int64_t m = static_cast<int64_t>(tps.size());

  // AUROC: trapezoid over (fpr, tpr) with (0, 0) prepended.
  double auroc = 0.0, prev_tpr = 0.0, prev_fpr = 0.0;
  for (int64_t i = 0; i < m; ++i) {
    const double tpr = tps[i] / n_pos, fpr = fps[i] / n_neg;
    auroc += (fpr - prev_fpr) * (tpr + prev_tpr) * 0.5;
    prev_tpr = tpr;
    prev_fpr = fpr;
  }

  // AP: sum (R_i - R_{i-1}) * P_i.
  double ap = 0.0, prev_rec = 0.0;
  for (int64_t i = 0; i < m; ++i) {
    const double prec = tps[i] / (tps[i] + fps[i]);
    const double rec = tps[i] / n_pos;
    ap += (rec - prev_rec) * prec;
    prev_rec = rec;
  }

  // FPR@recall: walk from the first threshold achieving full recall back to the
  // most confident, append the (recall=1, fps=0) endpoint, pick
  // argmin |recall - level| — first match wins (np.argmin semantics).
  int64_t last_ind = 0;  // first index with tps >= n_pos (searchsorted left)
  while (last_ind < m && tps[last_ind] < static_cast<double>(n_pos)) ++last_ind;
  double best = 1e300, fpr_out = 1.0;
  for (int64_t i = last_ind; i >= 0; --i) {
    if (i >= m) continue;
    const double d = std::fabs(tps[i] / n_pos - recall_level);
    if (d < best) {
      best = d;
      fpr_out = fps[i] / n_neg;
    }
  }
  if (std::fabs(1.0 - recall_level) < best) fpr_out = 0.0;

  out3[0] = auroc;
  out3[1] = ap;
  out3[2] = fpr_out;
  return 0;
}
