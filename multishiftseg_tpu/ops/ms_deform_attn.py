"""Multi-scale deformable attention (the reference's hand-written CUDA op, rebuilt
for TPU).

The reference implements this as ``MSDeformAttnFunction`` backed by
``ms_deformable_im2col_gpu_kernel`` + six backward-kernel variants
(``lib/network/mask2former/modeling/pixel_decoder/ops/``, ~1.7k LoC CUDA), with a
pure-PyTorch ``grid_sample`` fallback (``ms_deform_attn_func.py:52-72``).

Here the op is a pure XLA expression: per level, one clamped 2x2-window patch gather
per sample point + a bf16 weighted reduction (see ``_core_forward`` for the measured
TPU design notes), with a hand-written VJP (``_core_vjp_bwd``) playing the role of the
reference's six CUDA backward kernels — XLA's derived adjoint is ~50x slower and
memory-unbounded. No ``im2col_step`` staging is needed under jit.

Layout conventions (differ from the reference's [N, S, M, D] torch layout only in that
everything stays channels-last):
  value:               [N, S, M, D]  (S = sum_l H_l*W_l)
  sampling_locations:  [N, Lq, M, L, P, 2]  normalized [0, 1], (x, y)
  attention_weights:   [N, Lq, M, L, P]  (softmax-normalized over L*P by the module)
  output:              [N, Lq, M*D]
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name


def ms_deform_attn_core(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    quantize_table: bool = False,
    sample_mode: str = "bilinear",
) -> jax.Array:
    """Multi-scale deformable attention with a hand-written backward.

    XLA's autodiff of the window gather lowers its adjoint to a serial ``while``
    scatter (~7.8 s per encoder layer at training shapes, measured); the custom VJP
    below expresses the same adjoint as vmapped row scatter-adds (~100x faster).

    ``quantize_table=True`` stores the im2col value table in int8 with a
    per-channel (per-``d``) symmetric scale folded into the bilinear corner
    weights — halving the bytes of the layout-bound post-gather pipeline. The
    backward (and the grads of a quantized forward) use the exact bf16/fp32
    values; see ``test_ms_deform_attn.py`` for the accuracy gate vs the fp32
    oracle.

    ``sample_mode="nearest"`` is the APPROXIMATE eval fast path (PERF.md
    round-3 ceiling analysis): round each sample point to its nearest pixel and
    gather one [1, D] value row instead of a [1, 4D] bilinear window — no
    im2col table build, and the layout-bound post-gather pipeline shrinks 4x
    (the corner-weight expansion and block-sum dot disappear entirely). Exact
    at pixel centers; deviation vs the bilinear op is measured and gated in
    ``test_ms_deform_attn.py``. Eval-only: its autodiff falls back to XLA's
    slow derived scatter, so trainers must keep the default exact mode.
    """
    if sample_mode == "nearest":
        return _core_forward_nearest(tuple(spatial_shapes), value,
                                     sampling_locations, attention_weights)
    if sample_mode == "shared":
        return _core_forward_shared(tuple(spatial_shapes), value,
                                    sampling_locations, attention_weights)
    if sample_mode.startswith("nearest_top"):
        spec = sample_mode[len("nearest_top"):]
        if spec.endswith("c"):
            return _core_forward_nearest_topk_centroid(
                tuple(spatial_shapes), value, sampling_locations,
                attention_weights, int(spec[:-1]))
        return _core_forward_nearest_topk(tuple(spatial_shapes), value,
                                          sampling_locations,
                                          attention_weights, int(spec))
    assert sample_mode == "bilinear", sample_mode
    return _ms_deform_attn_core_vjp(tuple(spatial_shapes), bool(quantize_table),
                                    value, sampling_locations, attention_weights)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ms_deform_attn_core_vjp(spatial_shapes, quantize_table, value,
                             sampling_locations, attention_weights):
    return _core_forward(spatial_shapes, value, sampling_locations,
                         attention_weights, quantize_table)


def _core_forward(
    spatial_shapes: Sequence[Tuple[int, int]],
    value: jax.Array,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    quantize_table: bool = False,
) -> jax.Array:
    """Pure-XLA multi-scale deformable attention forward.

    Matches ``grid_sample(mode='bilinear', padding_mode='zeros', align_corners=False)``
    per level: sample x = loc_x * W - 0.5 in pixel space, OOB corners contribute 0.

    TPU design notes (measured on v5e at 1024x2048 eval shapes;
    ``tools/gather_microbench.py``):
      * XLA:TPU gather cost is per-index; the fastest measured geometry is a FLAT 1-D
        row gather (no ``operand_batching_dims``, no 2-D ``start_index_map``) of
        [1, 4*D]-wide rows: 2.7 ns/index vs 20.5 ns/index for a (2,2,D) window gather
        with batching dims (7.6x), at identical bytes per slice.
      * So each level's map is first im2col'd into a ``[N*M*H*W, 4*D]`` table whose
        row (i, j) holds the 2x2 bilinear window ``[v(i,j), v(i,j+1), v(i+1,j),
        v(i+1,j+1)]`` (four shifted copies — dense data-formatting, ~0.3 ms/level),
        then ONE flat row per sample point is gathered.
      * the weighted reduction multiplies in bf16 and accumulates in fp32 — an fp32
        patch upcast doubles the traffic, and an einsum becomes a batched 1x16 x 16xD
        matmul wasting >99% of the 128x128 MXU.
    """
    n, s, m, d = value.shape
    _, lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    compute_dtype = value.dtype

    # One level-concatenated im2col table per layer: row ((n*M + m)*S + off_l +
    # i*W_l + j) holds the 2x2 window rooted at (i, j) of level l — so the WHOLE
    # layer is ONE flat row gather, and all index math is one fusion (per-level
    # slicing of transposed [N, Lq, M, L, P] tensors costs ~0.5 ms in layout copies
    # per slice at eval shapes).
    v = value.transpose(0, 2, 1, 3)  # [N, M, S, D]
    if quantize_table:
        # Per-channel symmetric int8: halves every byte the layout-bound
        # post-gather pipeline moves (gather output, retile, dequant-multiply
        # read). The [D] scale is folded into the corner weights below, so the
        # dequant costs nothing extra.
        scale_d = jnp.max(jnp.abs(value.astype(jnp.float32)), axis=(0, 1, 2)) / 127.0
        scale_d = jnp.maximum(scale_d, 1e-12)  # [D]
        v = jnp.clip(jnp.round(v.astype(jnp.float32) / scale_d), -127, 127).astype(
            jnp.int8
        )
    tables = []
    start = 0
    for (h, w) in spatial_shapes:
        vl = v[:, :, start : start + h * w].reshape(n * m, h, w, d)
        tables.append(_im2col_table(vl).reshape(n * m, h * w, 4 * d))
        start += h * w
    tab = jnp.concatenate(tables, axis=1).reshape(n * m * s, 4 * d)

    hw = np.asarray(spatial_shapes, np.int64)  # [L, 2] (h, w)
    off_np = np.concatenate([[0], np.cumsum(hw[:, 0] * hw[:, 1])[:-1]])

    # Lane-structured coordinate math: every [.., 1]- or [.., P]-shaped slice of the
    # [N, Lq, M, L, P, 2] location tensor tiles at <4% memory utilization (measured
    # ~4 ms per producer fusion at eval shapes). Instead keep the natural flat
    # [N, Lq, 192] view — lane k = m*(L*P) + l*P + p interleaved with (x, y) — and
    # do everything with per-lane [96] constant vectors; the only reorganisation is
    # one strided lane split (x = even lanes, y = odd lanes).
    K = m * L * P  # 96 lanes per coordinate
    loc192 = sampling_locations.astype(jnp.float32).reshape(n, lq, 2 * K)
    x96 = loc192[:, :, 0::2]  # [N, Lq, K]
    y96 = loc192[:, :, 1::2]
    lane_l = (np.arange(K) // P) % L  # level of lane k
    wv96 = jnp.asarray(hw[lane_l, 1], jnp.float32)
    hv96 = jnp.asarray(hw[lane_l, 0], jnp.float32)
    x = x96 * wv96 - 0.5  # [N, Lq, K]
    y = y96 * hv96 - 0.5
    # Clamped 2x2-window start: one gathered im2col row covers all 4 bilinear
    # corners, quartering the index count. The upper clamp saturates at 0 for
    # degenerate h==1/w==1 levels (a 32-px input dim) — h-2 = -1 would push the
    # window into the PREVIOUS level's table rows; at start 0 the im2col table's
    # zero-padded bottom/right entries reproduce grid_sample's zero padding.
    sy = jnp.clip(jnp.floor(y), 0.0, jnp.maximum(hv96 - 2.0, 0.0))
    sx = jnp.clip(jnp.floor(x), 0.0, jnp.maximum(wv96 - 2.0, 0.0))
    m96 = jnp.asarray(np.arange(K) // (L * P), jnp.int32)
    off96 = jnp.asarray(off_np[lane_l], jnp.int32)
    wi96 = jnp.asarray(hw[lane_l, 1], jnp.int32)
    lin = (
        (jnp.arange(n, dtype=jnp.int32)[:, None, None] * m + m96) * s
        + off96
        + sy.astype(jnp.int32) * wi96
        + sx.astype(jnp.int32)
    )
    rows = _flat_row_gather(tab, lin.reshape(-1))  # [R, 4D], R = N*Lq*K

    # Corner weights reproduce grid_sample zero-padding exactly: corner (i, j) at
    # absolute (sy+i, sx+j) gets relu(1-|y-(sy+i)|)*relu(1-|x-(sx+j)|); OOB sample
    # positions are >1 away from every in-window corner -> weight 0. Weights are
    # computed DIRECTLY in lane-indexed [R, 4D] form (lane l = corner l // D,
    # (cy, cx) = (c // 2, c % 2)) — [R, 4]- or [..., 2, 2]-shaped f32 intermediates
    # put 4 elements in an (8, 128) memory tile (<4% utilization, ~3 ms each in the
    # device trace). The whole expression is elementwise over broadcast [R, 1]
    # coordinates and fuses into the multiply+reduce with the gathered rows.
    # Pre-reduce to four per-row corner weights in cheap [N, Lq, K] lane form
    # (the relu/abs algebra runs once per row, not once per [R, 4D] element — the
    # big fusion was VPU-bound at ~10 ops/element), then expand by corner lane
    # with two selects.
    a96 = attention_weights.astype(jnp.float32).reshape(n, lq, K)
    ty = y - sy  # in [0, 1] except at the clamp boundary (OOB -> weight 0 below)
    tx = x - sx
    wy0 = jax.nn.relu(1.0 - jnp.abs(ty))
    wy1 = jax.nn.relu(1.0 - jnp.abs(ty - 1.0))
    wx0 = jax.nn.relu(1.0 - jnp.abs(tx))
    wx1 = jax.nn.relu(1.0 - jnp.abs(tx - 1.0))
    w00 = wy0 * wx0 * a96
    w01 = wy0 * wx1 * a96
    w10 = wy1 * wx0 * a96
    w11 = wy1 * wx1 * a96
    # Block-sum matmul: BS[c*D+dd, dd] = 1 sums the four weighted corner blocks on
    # the MXU; XLA fuses the [R, 4D] weight multiply into this dot (a separate
    # multiply materializes 1 GB and a Pallas reduction kernel was measured slower
    # than this fused dot + sum: the [R, D] operand pads to 4x memory at D=32).
    # Measured dead ends (v5e, 1024x2048): folding the L*P sum into the
    # contraction as [N*Lq*M, 12*4D] x [12*4D, D] -> 5.0 img/s, and as
    # [N*Lq, K*4D] x [K*4D, M*D] -> 5.95 img/s, vs 6.69 for this two-step form.
    lane_c = jnp.asarray(np.arange(4 * d) // d, jnp.int32)  # [4D]
    r = n * lq * K
    wexp = jnp.where(
        lane_c < 2,
        jnp.where(lane_c == 0, w00.reshape(r, 1), w01.reshape(r, 1)),
        jnp.where(lane_c == 2, w10.reshape(r, 1), w11.reshape(r, 1)),
    )  # [R, 4D] f32
    if quantize_table:
        # fused dequant: per-lane [4D] scale (the per-channel scale tiled over the
        # four corner blocks) multiplies into the corner-weight expansion
        wexp = wexp * jnp.tile(scale_d, 4)[None, :]
        rows = rows.astype(compute_dtype)
    wexp = wexp.astype(compute_dtype)
    BS = jnp.asarray(np.tile(np.eye(d), (4, 1)), compute_dtype)  # [4D, D]
    part = jax.lax.dot_general(
        rows * wexp, BS, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, D]
    out = part.reshape(n, lq, m, L * P, d).sum(3)
    return out.reshape(n, lq, m * d).astype(compute_dtype)


def _core_forward_nearest(
    spatial_shapes: Sequence[Tuple[int, int]],
    value: jax.Array,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Nearest-pixel approximate forward (see ``ms_deform_attn_core``).

    Replaces the bilinear 2x2 window with the single nearest value row. The
    gather issue count is unchanged (it is the hard floor, PERF.md), but rows
    are [1, D] straight out of the level-concat value tensor: the im2col table
    build (~0.3 ms x L x layers), the [R, 4D] corner-weight expansion, and the
    [R, 4D] x [4D, D] block-sum dot all disappear — the post-gather chain moves
    4x fewer bytes. grid_sample's zero padding is approximated by zeroing the
    attention weight of samples outside the half-pixel border.

    Row order is J-MAJOR / head-minor: lane k = (l*P + p)*M + m, so the
    gather output [R, D] is linearly [N*Lq, J, M*D] and the point-sum is a
    contiguous block reduction straight into the op's [N, Lq, M*D] output —
    no re-tiling of the 260 MB/layer row tensor. (The head-major order used
    through round 4 needed a [R, D] -> [N, Lq, M, J, D] relayout the v5e
    trace priced at 3.9 ms/layer, ~23 ms/image of the round-4 headline.)
    """
    n, s, m, d = value.shape
    _, lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    compute_dtype = value.dtype
    J = L * P
    K = m * J
    v = value.transpose(0, 2, 1, 3).reshape(n * m * s, d)

    hw = np.asarray(spatial_shapes, np.int64)
    off_np = np.concatenate([[0], np.cumsum(hw[:, 0] * hw[:, 1])[:-1]])
    # j-major lane order: one transpose of the small [N, Lq, M, L, P, 2]
    # location tensor (vs re-tiling the huge gathered-row tensor)
    locT = (sampling_locations.astype(jnp.float32)
            .transpose(0, 1, 3, 4, 2, 5)  # [N, Lq, L, P, M, 2]
            .reshape(n, lq, 2 * K))
    x96 = locT[:, :, 0::2]  # [N, Lq, K], lane k = (l*P + p)*M + m
    y96 = locT[:, :, 1::2]
    lane_j = np.arange(K) // m
    lane_l = lane_j // P
    wv96 = jnp.asarray(hw[lane_l, 1], jnp.float32)
    hv96 = jnp.asarray(hw[lane_l, 0], jnp.float32)
    x = x96 * wv96 - 0.5
    y = y96 * hv96 - 0.5
    ix = jnp.clip(jnp.floor(x + 0.5), 0.0, wv96 - 1.0)
    iy = jnp.clip(jnp.floor(y + 0.5), 0.0, hv96 - 1.0)
    # zero-padding analog: the nearest in-bounds pixel is >0.5 px away -> drop
    inb = (x > -0.5) & (x < wv96 - 0.5) & (y > -0.5) & (y < hv96 - 0.5)
    m96 = jnp.asarray(np.arange(K) % m, jnp.int32)
    off96 = jnp.asarray(off_np[lane_l], jnp.int32)
    wi96 = jnp.asarray(hw[lane_l, 1], jnp.int32)
    lin = (
        (jnp.arange(n, dtype=jnp.int32)[:, None, None] * m + m96) * s
        + off96
        + iy.astype(jnp.int32) * wi96
        + ix.astype(jnp.int32)
    )
    rows = _flat_row_gather(v, lin.reshape(-1))  # [R, D], R = (n, lq, j, m)
    aT = (attention_weights.astype(jnp.float32)
          .transpose(0, 1, 3, 4, 2)  # [N, Lq, L, P, M]
          .reshape(n, lq, K))
    a = jnp.where(inb, aT, 0.0).reshape(n * lq * K, 1).astype(compute_dtype)
    part = (rows * a).reshape(n, lq, J, m * d)  # linear view, no relayout
    return part.sum(2, dtype=jnp.float32).astype(compute_dtype)


def _core_forward_nearest_topk(
    spatial_shapes: Sequence[Tuple[int, int]],
    value: jax.Array,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    top: int,
) -> jax.Array:
    """Nearest sampling restricted to each head's ``top`` highest-weight
    points (``sample_mode="nearest_top{T}"``).

    The deformable attention weights are a softmax over the L*P points per
    head (reference ``ms_deform_attn.py:126``), so the tail of that
    distribution carries little output mass: keeping the top-T points and
    renormalizing their weights preserves the convex combination while
    gathering T/(L*P) of nearest mode's rows — and the gather ISSUE rate is
    the measured hard floor of this op (PERF.md: 1.85 ns/index; row count,
    not bytes, is what `shared` mode's 14.6 vs nearest's ~9 img/s split
    demonstrates). Error is bounded by the dropped softmax mass; unlike
    ``shared``'s head collapse it vanishes as T -> L*P. The top-k runs on the
    small [N, Lq, M, L*P] weight tensor (VPU), selected indices drive
    jnp.take_along_axis on the precomputed flat row indices. Eval-only, like
    the other approximate modes; accuracy must be checkpoint-qualified
    (tools/learning_demo.py --qualify_sampling, ±0.5-pt gate).
    """
    n, s, m, d = value.shape
    _, lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    J = L * P
    assert 0 < top <= J, (top, J)
    compute_dtype = value.dtype
    v = value.transpose(0, 2, 1, 3).reshape(n * m * s, d)

    hw = np.asarray(spatial_shapes, np.int64)
    off_np = np.concatenate([[0], np.cumsum(hw[:, 0] * hw[:, 1])[:-1]])
    K = m * J
    loc192 = sampling_locations.astype(jnp.float32).reshape(n, lq, 2 * K)
    x96 = loc192[:, :, 0::2]
    y96 = loc192[:, :, 1::2]
    lane_l = (np.arange(K) // P) % L
    wv96 = jnp.asarray(hw[lane_l, 1], jnp.float32)
    hv96 = jnp.asarray(hw[lane_l, 0], jnp.float32)
    x = x96 * wv96 - 0.5
    y = y96 * hv96 - 0.5
    ix = jnp.clip(jnp.floor(x + 0.5), 0.0, wv96 - 1.0)
    iy = jnp.clip(jnp.floor(y + 0.5), 0.0, hv96 - 1.0)
    inb = (x > -0.5) & (x < wv96 - 0.5) & (y > -0.5) & (y < hv96 - 0.5)
    m96 = jnp.asarray(np.arange(K) // J, jnp.int32)
    off96 = jnp.asarray(off_np[lane_l], jnp.int32)
    wi96 = jnp.asarray(hw[lane_l, 1], jnp.int32)
    lin = (
        (jnp.arange(n, dtype=jnp.int32)[:, None, None] * m + m96) * s
        + off96
        + iy.astype(jnp.int32) * wi96
        + ix.astype(jnp.int32)
    )  # [N, Lq, K]

    # zero OOB weights BEFORE selection (an OOB point must not occupy a slot),
    # select per head, renormalize the kept mass
    a = jnp.where(inb, attention_weights.astype(jnp.float32)
                  .reshape(n, lq, K), 0.0).reshape(n, lq, m, J)
    a_sel, j_sel = jax.lax.top_k(a, top)  # [N, Lq, M, T]
    a_sel = a_sel * (a.sum(-1, keepdims=True)
                     / jnp.maximum(a_sel.sum(-1, keepdims=True), 1e-12))
    lin_sel = jnp.take_along_axis(lin.reshape(n, lq, m, J), j_sel, axis=-1)

    rows = _flat_row_gather(v, lin_sel.reshape(-1))  # [N*Lq*M*T, D]
    a_c = a_sel.reshape(n * lq * m * top, 1).astype(compute_dtype)
    part = (rows * a_c).reshape(n, lq, m, top, d)
    return part.sum(3, dtype=jnp.float32).reshape(n, lq, m * d).astype(compute_dtype)


def _core_forward_nearest_topk_centroid(
    spatial_shapes: Sequence[Tuple[int, int]],
    value: jax.Array,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    top: int,
) -> jax.Array:
    """Top-T nearest sampling with a per-(head, level) CENTROID correction for
    the dropped tail (``sample_mode="nearest_top{T}c"``).

    Plain ``nearest_top{T}`` renormalizes the kept softmax mass over the kept
    points — redistributing the tail's mass onto locations it never attended,
    which is exactly the error the round-5 qualification measured outside the
    ±0.5-pt budget (AUPRC −0.8..−1.0 pt at T=8/6, outputs/r5). Here the kept
    top-T points keep their EXACT weights, and each (head, level)'s dropped
    points are approximated by ONE extra nearest-gathered row at their
    attention-mass-weighted centroid, carrying the tail's exact total mass.
    The approximation error is second-order (the spatial spread of a head's
    small-mass tail within one level) instead of first-order (relocated
    mass). Rows per head: T + L vs nearest's J = L*P — at the M2F config
    (L=3, P=4, T=6) a 25% cut of the gather issue count that PERF.md proves
    is the op's hard floor. Reduces exactly to ``nearest`` when every head's
    mass lies on ≤ T points (tail mass 0). Eval-only; accuracy must be
    checkpoint-qualified (tools/learning_demo.py --qualify_sampling).
    """
    n, s, m, d = value.shape
    _, lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    J = L * P
    assert 0 < top <= J, (top, J)
    compute_dtype = value.dtype
    v = value.transpose(0, 2, 1, 3).reshape(n * m * s, d)

    hw = np.asarray(spatial_shapes, np.int64)
    off_np = np.concatenate([[0], np.cumsum(hw[:, 0] * hw[:, 1])[:-1]])
    K = m * J
    loc192 = sampling_locations.astype(jnp.float32).reshape(n, lq, 2 * K)
    x96 = loc192[:, :, 0::2]  # [N, Lq, K] normalized x
    y96 = loc192[:, :, 1::2]
    lane_l = (np.arange(K) // P) % L
    wv96 = jnp.asarray(hw[lane_l, 1], jnp.float32)
    hv96 = jnp.asarray(hw[lane_l, 0], jnp.float32)
    x = x96 * wv96 - 0.5
    y = y96 * hv96 - 0.5
    ix = jnp.clip(jnp.floor(x + 0.5), 0.0, wv96 - 1.0)
    iy = jnp.clip(jnp.floor(y + 0.5), 0.0, hv96 - 1.0)
    inb = (x > -0.5) & (x < wv96 - 0.5) & (y > -0.5) & (y < hv96 - 0.5)
    m96 = jnp.asarray(np.arange(K) // J, jnp.int32)
    off96 = jnp.asarray(off_np[lane_l], jnp.int32)
    wi96 = jnp.asarray(hw[lane_l, 1], jnp.int32)
    lin = (
        (jnp.arange(n, dtype=jnp.int32)[:, None, None] * m + m96) * s
        + off96
        + iy.astype(jnp.int32) * wi96
        + ix.astype(jnp.int32)
    )  # [N, Lq, K]

    # kept points: exact weights (NO renormalization — the tail carries its
    # own mass below); OOB points zeroed before selection as in topk mode
    a = jnp.where(inb, attention_weights.astype(jnp.float32)
                  .reshape(n, lq, K), 0.0).reshape(n, lq, m, J)
    a_sel, j_sel = jax.lax.top_k(a, top)  # [N, Lq, M, T]
    lin_sel = jnp.take_along_axis(lin.reshape(n, lq, m, J), j_sel, axis=-1)

    # tail = the J - T unselected points; per (head, level) weighted centroid
    # in NORMALIZED coords (level-uniform), carrying the tail's total mass
    kept = jax.nn.one_hot(j_sel, J, dtype=jnp.float32).sum(-2)  # [N,Lq,M,J]
    tail_w = (a * (1.0 - kept)).reshape(n, lq, m, L, P)
    mass = tail_w.sum(-1)  # [N, Lq, M, L]
    inv = 1.0 / jnp.maximum(mass, 1e-12)
    xn = x96.reshape(n, lq, m, L, P)
    yn = y96.reshape(n, lq, m, L, P)
    cx = (tail_w * xn).sum(-1) * inv  # [N, Lq, M, L] normalized
    cy = (tail_w * yn).sum(-1) * inv
    # zero-mass tails produce garbage centroids: park them mid-map (weight 0,
    # but the gather index must stay in bounds)
    safe = mass > 1e-12
    cx = jnp.where(safe, cx, 0.5)
    cy = jnp.where(safe, cy, 0.5)
    wvL = jnp.asarray(hw[:, 1], jnp.float32)  # [L]
    hvL = jnp.asarray(hw[:, 0], jnp.float32)
    xt = cx * wvL - 0.5
    yt = cy * hvL - 0.5
    ixt = jnp.clip(jnp.floor(xt + 0.5), 0.0, wvL - 1.0)
    iyt = jnp.clip(jnp.floor(yt + 0.5), 0.0, hvL - 1.0)
    inb_t = (xt > -0.5) & (xt < wvL - 0.5) & (yt > -0.5) & (yt < hvL - 0.5)
    mass = jnp.where(inb_t, mass, 0.0)
    offL = jnp.asarray(off_np, jnp.int32)  # [L]
    wiL = jnp.asarray(hw[:, 1], jnp.int32)
    mrow = jnp.asarray(np.arange(m), jnp.int32)[None, None, :, None]
    lin_tail = (
        (jnp.arange(n, dtype=jnp.int32)[:, None, None, None] * m + mrow) * s
        + offL
        + iyt.astype(jnp.int32) * wiL
        + ixt.astype(jnp.int32)
    )  # [N, Lq, M, L]

    # ONE gather for kept + tail rows, one fused weighted reduction
    lin_all = jnp.concatenate([lin_sel, lin_tail], axis=-1)  # [N,Lq,M,T+L]
    w_all = jnp.concatenate([a_sel, mass], axis=-1)
    rows = _flat_row_gather(v, lin_all.reshape(-1))  # [N*Lq*M*(T+L), D]
    w_c = w_all.reshape(n * lq * m * (top + L), 1).astype(compute_dtype)
    part = (rows * w_c).reshape(n, lq, m, top + L, d)
    return part.sum(3, dtype=jnp.float32).reshape(n, lq, m * d).astype(compute_dtype)


def _core_forward_shared(
    spatial_shapes: Sequence[Tuple[int, int]],
    value: jax.Array,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Shared-corner approximate forward: ONE gather per (level, point) shared
    across the heads (PERF.md ceiling statement; the reference gathers one
    bilinear window per (head, level, point),
    ``ops/functions/ms_deform_attn_func.py:52-72``).

    The gather issue rate is the op's hard floor (1.85 ns/index x 24.8M
    indices at eval shapes = 45.7 ms/image, PERF.md round 1-3); ``nearest``
    mode already strips the post-gather chain to its minimum but keeps every
    index. This mode collapses the per-head sampling locations to ONE location
    per (l, p) — their attention-mass-weighted centroid — rounds it to the
    nearest pixel, and gathers the full [1, M*D] channel row straight from the
    [N*S, M*D] value view (heads are channel-contiguous there: no transpose,
    no table build). Indices drop 8x (one per (l, p) instead of one per
    (m, l, p)); bytes moved are unchanged (8 heads x D vs 1 x M*D per point).
    Per-head attention weights stay exact. Eval-only (no custom VJP), like
    ``nearest``; accuracy must be checkpoint-qualified end-to-end before
    production use (``tools/learning_demo.py --qualify_sampling``, +-0.5 pt
    gate) — the collapse changes numerics more than nearest rounding does.
    """
    n, s, m, d = value.shape
    _, lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    compute_dtype = value.dtype
    J = L * P
    K = m * J
    v = value.reshape(n * s, m * d)

    hw = np.asarray(spatial_shapes, np.int64)
    off_np = np.concatenate([[0], np.cumsum(hw[:, 0] * hw[:, 1])[:-1]])
    # lane-form coordinate math as in the other modes (lane k = m*J + l*P + p)
    loc192 = sampling_locations.astype(jnp.float32).reshape(n, lq, 2 * K)
    x96 = loc192[:, :, 0::2]
    y96 = loc192[:, :, 1::2]
    a96 = attention_weights.astype(jnp.float32).reshape(n, lq, K)

    # head collapse: per (l, p), the attention-mass-weighted centroid of the 8
    # head locations — a head with all its (l, p) mass at u pulls the shared
    # point to u; near-zero-weight heads (whose sample barely contributes to
    # the exact op either) barely move it.
    a_h = a96.reshape(n, lq, m, J)
    asum = a_h.sum(2)  # [N, Lq, J]
    inv = 1.0 / jnp.maximum(asum, 1e-12)
    xs = (x96 * a96).reshape(n, lq, m, J).sum(2) * inv
    ys = (y96 * a96).reshape(n, lq, m, J).sum(2) * inv

    lane_l = np.arange(J) // P
    wv = jnp.asarray(hw[lane_l, 1], jnp.float32)  # [J]
    hv = jnp.asarray(hw[lane_l, 0], jnp.float32)
    x = xs * wv - 0.5
    y = ys * hv - 0.5
    ix = jnp.clip(jnp.floor(x + 0.5), 0.0, wv - 1.0)
    iy = jnp.clip(jnp.floor(y + 0.5), 0.0, hv - 1.0)
    # zero-padding analog (see nearest mode): shared point out of bounds ->
    # drop the (l, p) contribution for every head
    inb = (x > -0.5) & (x < wv - 0.5) & (y > -0.5) & (y < hv - 0.5)

    off = jnp.asarray(off_np[lane_l], jnp.int32)
    wi = jnp.asarray(hw[lane_l, 1], jnp.int32)
    lin = (
        jnp.arange(n, dtype=jnp.int32)[:, None, None] * s
        + off
        + iy.astype(jnp.int32) * wi
        + ix.astype(jnp.int32)
    )
    rows = _flat_row_gather(v, lin.reshape(-1))  # [N*Lq*J, M*D]

    # exact per-head weights over the shared rows: out[m, d] =
    # sum_j a[m, j] * row[j, m*D + d]
    a_t = (
        jnp.where(inb[:, :, None, :], a_h, 0.0)
        .transpose(0, 1, 3, 2)  # [N, Lq, J, M] (small f32 tensor)
        .astype(compute_dtype)
    )
    part = rows.reshape(n, lq, J, m, d) * a_t[..., None]
    out = part.sum(2, dtype=jnp.float32)
    return out.reshape(n, lq, m * d).astype(compute_dtype)


def _core_vjp_fwd(spatial_shapes, quantize_table, value, sampling_locations,
                  attention_weights):
    out = _core_forward(spatial_shapes, value, sampling_locations,
                        attention_weights, quantize_table)
    return out, (value, sampling_locations, attention_weights)


def _col2im(dcol: jax.Array, h: int, w: int) -> jax.Array:
    """Adjoint of ``_im2col_table``: fold [B, H, W, 4, D] corner grads back onto the
    map with four dense shifted adds (no scatter). Corner c = (cy, cx) rooted at
    (i, j) contributes to value position (i+cy, j+cx)."""
    b, _, _, _, d = dcol.shape
    z_l = jnp.zeros((b, h, 1, d), dcol.dtype)
    z_t = jnp.zeros((b, 1, w, d), dcol.dtype)
    out = dcol[:, :, :, 0]
    out = out + jnp.concatenate([z_l, dcol[:, :, :-1, 1]], axis=2)
    out = out + jnp.concatenate([z_t, dcol[:, :-1, :, 2]], axis=1)
    sxy = jnp.concatenate([z_l, dcol[:, :, :-1, 3]], axis=2)
    out = out + jnp.concatenate([z_t, sxy[:, :-1]], axis=1)
    return out


def _core_vjp_bwd(spatial_shapes, quantize_table, residuals, g):
    """Hand-written adjoint (the reference hand-writes six CUDA kernels for this,
    ``ms_deform_im2col_cuda.cuh:306-927``; XLA's derived scatter is ~100x slower).

    Same im2col geometry as the forward: regather rows (2.7 ns/index), compute the
    attention/location grads with dense algebra, and scatter ONE [1, 4D] corner-grad
    row per sample point into an im2col grad table, folded back with four dense
    shifted adds (``_col2im``). TPU scatter cost is per-index and flat in row width
    (measured 15.2 ns/idx at [1,128] vs 16.4 at [1,32]), so one wide row beats the
    four narrow corner rows it replaces by ~4.3x."""
    value, sampling_locations, attention_weights = residuals
    n, s, m, d = value.shape
    _, lq, _, L, P, _ = sampling_locations.shape

    loc = sampling_locations.astype(jnp.float32)
    v = value.transpose(0, 2, 1, 3).reshape(n * m, s, d)
    loc_m = loc.transpose(0, 2, 1, 3, 4, 5).reshape(n * m, lq, L, P, 2)
    attn_m = (
        attention_weights.astype(jnp.float32)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n * m, lq, L, P)
    )
    gq = (
        g.astype(jnp.float32)
        .reshape(n, lq, m, d)
        .transpose(0, 2, 1, 3)
        .reshape(n * m, lq, d)
    )

    # Row-form constants (see _core_forward): E broadcasts corner weights over
    # D-lane blocks; ET sums each D-lane block back to one scalar per corner.
    E = jnp.asarray(np.repeat(np.eye(4), d, axis=1), jnp.float32)  # [4, 4D]
    ET = E.T  # [4D, 4]

    dv_levels = []
    dattn_l = []
    dloc_l = []
    pos = jnp.arange(2, dtype=jnp.float32)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        x = loc_m[:, :, lid, :, 0] * w - 0.5
        y = loc_m[:, :, lid, :, 1] * h - 0.5
        # max(0, ·): h==1/w==1 levels would clamp to -1 and corrupt the scatter
        sy = jnp.clip(jnp.floor(y), 0, max(h - 2, 0)).astype(jnp.int32)
        sx = jnp.clip(jnp.floor(x), 0, max(w - 2, 0)).astype(jnp.int32)
        vl = v[:, start : start + h * w].reshape(n * m, h, w, d)
        rows = _flat_row_gather(
            _im2col_table(vl), _window_index(sy, sx, h, w).reshape(-1)
        ).astype(jnp.float32)  # [R, 4D] corner-major windows

        ddy = y[..., None] - (sy[..., None] + pos)  # [nm, lq, P, 2]
        ddx = x[..., None] - (sx[..., None] + pos)
        wy = jax.nn.relu(1.0 - jnp.abs(ddy))
        wx = jax.nn.relu(1.0 - jnp.abs(ddx))
        gwy = jnp.where(jnp.abs(ddy) < 1.0, -jnp.sign(ddy), 0.0)
        gwx = jnp.where(jnp.abs(ddx) < 1.0, -jnp.sign(ddx), 0.0)

        # <corner_c, g> per sample point, in row form: tile g over the four corner
        # blocks, multiply, block-sum — no (2,2,D) patch tensor is materialized.
        # (A fully lane-structured alternative — corner weights expanded over
        # 4D lanes with two selects, three fused multiply+ones-dot reduces in
        # place of this [R, 4] inner + the (2, 2) einsums — was measured at
        # 1255 ms vs 946 ms same-session at stage-2 shapes and rejected, the
        # round-2 wholesale-lane result reproduced piecewise: contracting
        # 128 lanes to 1 re-reads the [R, 4D] product once per output and
        # XLA's corner-minor einsums here are cheaper than they look.)
        gqt = jnp.tile(gq, (1, 1, 4))  # [nm, lq, 4D]
        prod = rows.reshape(n * m, lq, P, 4 * d) * gqt[:, :, None, :]
        inner = jax.lax.dot_general(
            prod.reshape(n * m * lq * P, 4 * d), ET, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(n * m, lq, P, 2, 2)
        a = attn_m[:, :, lid]  # [nm, lq, P]

        dattn_l.append(jnp.einsum("bqpij,bqpi,bqpj->bqp", inner, wy, wx))
        dy = a * jnp.einsum("bqpij,bqpi,bqpj->bqp", inner, gwy, wx) * h
        dx = a * jnp.einsum("bqpij,bqpi,bqpj->bqp", inner, wy, gwx) * w
        dloc_l.append(jnp.stack([dx, dy], -1))  # (x, y) order

        # one [4*D] im2col grad row per sample point: wgt_c * g, corner-major
        w4 = (wy[..., :, None] * wx[..., None, :]).reshape(n * m, lq, P, 4) * a[
            ..., None
        ]
        rows_g = (
            (w4.reshape(n * m * lq * P, 4) @ E).reshape(n * m, lq, P, 4 * d)
            * gqt[:, :, None, :]
        ).reshape(n * m * lq * P, 4 * d)
        lin = _window_index(sy, sx, h, w).reshape(-1)
        if _debug_bounds():
            _check_in_bounds(lin, n * m * h * w, "scatter")
        # MSS_BF16_SCATTER=1: accumulate the value-grad scatter in bf16 (halves the
        # bytes of the step's most expensive op — the per-level scatter is ~13.5
        # ns/index f32, PERF.md round-2). Opt-in: bf16 accumulation across the ~12
        # updates per row costs gradient mantissa; accuracy-gated in
        # test_ms_deform_attn.py::test_bf16_scatter_grad_gate.
        import os

        sdt = (jnp.bfloat16 if os.environ.get("MSS_BF16_SCATTER", "") == "1"
               else jnp.float32)
        dcol = (
            jnp.zeros((n * m * h * w, 4 * d), sdt).at[lin].add(rows_g.astype(sdt))
        )
        dv_levels.append(
            _col2im(dcol.reshape(n * m, h, w, 4, d).astype(jnp.float32), h, w)
            .reshape(n * m, h * w, d)
        )
        start += h * w

    dvalue = (
        jnp.concatenate(dv_levels, axis=1)
        .reshape(n, m, s, d)
        .transpose(0, 2, 1, 3)
        .astype(value.dtype)
    )
    dattn = (
        jnp.stack(dattn_l, 2)  # [nm, lq, L, P]
        .reshape(n, m, lq, L, P)
        .transpose(0, 2, 1, 3, 4)
        .astype(attention_weights.dtype)
    )
    dloc = (
        jnp.stack(dloc_l, 2)  # [nm, lq, L, P, 2]
        .reshape(n, m, lq, L, P, 2)
        .transpose(0, 2, 1, 3, 4, 5)
        .astype(sampling_locations.dtype)
    )
    return dvalue, dloc, dattn


_ms_deform_attn_core_vjp.defvjp(_core_vjp_fwd, _core_vjp_bwd)


def _im2col_table(img: jax.Array) -> jax.Array:
    """[B, H, W, D] -> [B*H*W, 4D] table; row (i, j) = the 2x2 window rooted there:
    ``[v(i,j), v(i,j+1), v(i+1,j), v(i+1,j+1)]`` (zeros past the bottom/right edge —
    never addressed, window starts are clamped to [0, H-2] x [0, W-2])."""
    b, h, w, d = img.shape
    z_r = jnp.zeros((b, h, 1, d), img.dtype)
    z_b = jnp.zeros((b, 1, w, d), img.dtype)
    sx = jnp.concatenate([img[:, :, 1:], z_r], axis=2)          # v(i, j+1)
    sy = jnp.concatenate([img[:, 1:], z_b], axis=1)             # v(i+1, j)
    sxy = jnp.concatenate([sx[:, 1:], z_b], axis=1)             # v(i+1, j+1)
    tab = jnp.concatenate([img, sx, sy, sxy], axis=-1)          # [B, H, W, 4D]
    return tab.reshape(b * h * w, 4 * d)


def _debug_bounds() -> bool:
    """Env-gated (``MSS_DEBUG_BOUNDS=1``) runtime check of the PROMISE_IN_BOUNDS
    invariant — the op's one silent-corruption hazard: a wrong ``off_np``/window
    entry would read or scatter garbage without failing. Checked at trace time of
    every gather/scatter site; parity tests run with it enabled."""
    import os

    return os.environ.get("MSS_DEBUG_BOUNDS", "") == "1"


def _check_in_bounds(lin: jax.Array, size: int, what: str) -> None:
    def raise_if(bad_count, lo, hi):
        if int(bad_count):
            raise RuntimeError(
                f"MSS_DEBUG_BOUNDS: {int(bad_count)} out-of-bounds {what} indices "
                f"(range [{int(lo)}, {int(hi)}], table size {size})"
            )

    bad = jnp.sum((lin < 0) | (lin >= size))
    jax.debug.callback(raise_if, bad, jnp.min(lin), jnp.max(lin))


def _flat_row_gather(tab: jax.Array, lin: jax.Array) -> jax.Array:
    """Gather [1, R] rows from a flat [T, R] table at int32 indices ``lin`` [...].

    The flat 1-D geometry (no operand_batching_dims, 1-D start_index_map) issues at
    ~2.7 ns/index on v5e vs ~20 ns/index for the equivalent 2-D window gather with
    batching dims (tools/gather_microbench.py)."""
    if _debug_bounds():
        _check_in_bounds(lin, tab.shape[0], "gather")
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,),
    )
    rows = jax.lax.gather(
        tab, lin.reshape(-1, 1), dimension_numbers=dnums,
        slice_sizes=(1, tab.shape[-1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return rows.reshape(*lin.shape, tab.shape[-1])


def _window_index(sy: jax.Array, sx: jax.Array, h: int, w: int) -> jax.Array:
    """Flat im2col row index with the batch folded in: b*H*W + sy*W + sx."""
    b = sy.shape[0]
    boff = (jnp.arange(b, dtype=jnp.int32) * (h * w)).reshape(
        (b,) + (1,) * (sy.ndim - 1)
    )
    return boff + sy * w + sx


def _sampling_offsets_bias_init(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Directional grid init for the offset head bias (the reference's
    ``MSDeformAttn._reset_parameters``, ``ops/modules/ms_deform_attn.py:66-74``)."""
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [M, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


class MSDeformAttn(nn.Module):
    """Deformable attention module: offset/weight heads + value/output projections.

    Behavioural port of ``ops/modules/ms_deform_attn.py:34-125`` (d_model 256, 8 heads,
    4 points), operating on static ``spatial_shapes``.
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Optional[jnp.dtype] = None
    quantize_table: bool = False
    sample_mode: str = "bilinear"  # "nearest" = approximate eval fast path
    tag_core: bool = False  # name the core output for remat policies (train)

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # [N, Lq, C]
        reference_points: jax.Array,  # [N, Lq, L, 2] in [0, 1]
        input_flatten: jax.Array,  # [N, S, C]
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jax.Array:
        n, lq, _ = query.shape
        m, L, P = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // m

        value = nn.Dense(
            self.d_model, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="value_proj",
        )(input_flatten)
        value = value.reshape(n, -1, m, d)

        offsets = nn.Dense(
            m * L * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _sampling_offsets_bias_init(m, L, P), dtype
            ),
            name="sampling_offsets",
        )(query).reshape(n, lq, m, L, P, 2)

        attn = nn.Dense(
            m * L * P, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(n, lq, m, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).reshape(n, lq, m, L, P)

        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], jnp.float32
        )  # [L, 2] (x, y) order
        loc = (
            reference_points[:, :, None, :, None, :].astype(jnp.float32)
            + offsets.astype(jnp.float32) / normalizer[None, None, None, :, None, :]
        )

        out = ms_deform_attn_core(value, spatial_shapes, loc, attn.astype(value.dtype),
                                  quantize_table=self.quantize_table,
                                  sample_mode=self.sample_mode)
        # Named for the encoder's remat policy (save_only_these_names): saving
        # this [N, Lq, M*D] activation (~42 MB/layer bf16 at train shapes) lets
        # the remat recompute DCE the whole core forward — table build, window
        # gather, weight-dot — leaving only the cheap projections to replay.
        # Train-only (tag_core): eval keeps the untagged graph the PERF.md
        # headlines were measured on (same-window A/B shows the tag is neutral
        # there; day-to-day chip variance dominates).
        if self.tag_core:
            out = checkpoint_name(out, "deform_core")
        return nn.Dense(
            self.d_model, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="output_proj",
        )(out)
