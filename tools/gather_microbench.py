"""Microbenchmark: XLA:TPU gather variants at M2F encoder shapes.

Shapes mirror one encoder layer's res3 level on a 1024x2048 image:
table per (batch*head): [S=32768, ...], queries Q=43008, P=4 points.
Total indices per variant are held comparable so ns/index is the figure of merit.

Timing: dependency-chained dispatches ending in a host read (block_until_ready lies
over the axon tunnel; see memory/axon-tunnel-quirks).
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B = 8            # N * M (batch * heads)
H, W = 128, 256  # res3 level
Q = 43008        # total queries sampling into this level
P = 4
D = 32

ITERS = 10


from tracing import trace_op


def timed(fn, tab, idx):
    """Per-iteration device-side time (seconds) from a profiler trace."""
    busy = trace_op(fn, tab, idx, iters=ITERS)
    # gather lowers into 'custom fusion'; include loop fusions (dequant etc.) too
    return busy["TOTAL"] / 1e3


def window_gather(img, starts, win):
    d = img.shape[-1]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(1, 2), operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        img, starts, dimension_numbers=dnums, slice_sizes=(1, win, win, d),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def row_gather(tab, idx):
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,), collapsed_slice_dims=(1,),
        start_index_map=(1,), operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        tab, idx[..., None], dimension_numbers=dnums,
        slice_sizes=(1, 1, tab.shape[-1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def main():
    rng = np.random.RandomState(0)
    img_bf16 = jnp.asarray(rng.randn(B, H, W, D), jnp.bfloat16)
    img_int8 = jnp.asarray(rng.randint(-127, 127, (B, H, W, D)), jnp.int8)
    sy = jnp.asarray(rng.randint(0, H - 8, (B, Q, P)), jnp.int32)
    sx = jnp.asarray(rng.randint(0, W - 8, (B, Q, P)), jnp.int32)
    starts = jnp.stack([sy, sx], -1).reshape(B, Q * P, 2)
    # merged per-query window start (one per query instead of one per point)
    startsq = starts.reshape(B, Q, P, 2)[:, :, 0, :]

    n_idx = B * Q * P

    results = {}

    f = jax.jit(partial(window_gather, win=2))
    results["(2,2,32) bf16 per point   "] = (timed(f, img_bf16, starts), n_idx)

    f = jax.jit(partial(window_gather, win=2))
    results["(2,2,32) int8 per point   "] = (timed(f, img_int8, starts), n_idx)

    f = jax.jit(lambda im, st: window_gather(im, st, 2).astype(jnp.bfloat16) * 0.5)
    results["(2,2,32) int8+dequant     "] = (timed(f, img_int8, starts), n_idx)

    # one merged (6,6,32) window per query covering all 4 points
    f = jax.jit(partial(window_gather, win=6))
    results["(6,6,32) bf16 per query   "] = (timed(f, img_bf16, startsq), B * Q)

    f = jax.jit(partial(window_gather, win=6))
    results["(6,6,32) int8 per query   "] = (timed(f, img_int8, startsq), B * Q)

    f = jax.jit(partial(window_gather, win=8))
    results["(8,8,32) bf16 per query   "] = (timed(f, img_bf16, startsq), B * Q)

    f = jax.jit(partial(window_gather, win=4))
    results["(4,4,32) bf16 per query   "] = (timed(f, img_bf16, startsq), B * Q)

    # row gather from an im2col'd [H*W, 4D] table (1-D index)
    tab = jnp.asarray(rng.randn(B, H * W, 4 * D), jnp.bfloat16)
    lin = (sy * W + sx).reshape(B, Q * P)
    f = jax.jit(row_gather)
    results["[1,128] row bf16 per point"] = (timed(f, tab, lin), n_idx)

    tab8 = jnp.asarray(rng.randint(-127, 127, (B, H * W, 4 * D)), jnp.int8)
    results["[1,128] row int8 per point"] = (timed(f, tab8, lin), n_idx)

    # flat batch: fold batch into the row index (no batching dims)
    tabf = tab.reshape(B * H * W, 4 * D)
    linf = (lin + (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]).reshape(-1)

    def flat_row(tabf, linf):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
        return jax.lax.gather(
            tabf, linf[:, None], dimension_numbers=dn,
            slice_sizes=(1, tabf.shape[-1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    f = jax.jit(flat_row)
    results["[1,128] row bf16 flat-B   "] = (timed(f, tabf, linf), n_idx)

    # flat x-pair im2col: [1, 64] rows, 2 indices per point (y row + y+1 row)
    tab2 = jnp.asarray(rng.randn(B * H * W, 2 * D), jnp.bfloat16)
    lin2 = jnp.concatenate([linf, linf + W], 0)  # both y rows, same table
    f = jax.jit(flat_row)
    results["[1,64] xpair bf16 flat    "] = (timed(f, tab2, lin2), 2 * n_idx)

    # flat plain rows [1, 32], 4 indices per point
    tab1 = jnp.asarray(rng.randn(B * H * W, D), jnp.bfloat16)
    lin4 = jnp.concatenate([linf, linf + 1, linf + W, linf + W + 1], 0)
    results["[1,32] corner bf16 flat   "] = (timed(f, tab1, lin4), 4 * n_idx)

    # flat [1, 256]: does doubling row width stay flat?
    tabw = jnp.asarray(rng.randn(B * H * W, 8 * D), jnp.bfloat16)
    results["[1,256] row bf16 flat     "] = (timed(f, tabw, linf), n_idx)

    # sorted flat indices
    linfs = jnp.sort(linf)
    f2 = jax.jit(lambda t, i: flat_row(t, i))
    results["[1,128] flat sorted       "] = (timed(f2, tabf, linfs), n_idx)

    # --- scatter variants (backward path) ---
    rows = jnp.asarray(rng.randn(B, Q * P, 4 * D), jnp.bfloat16)

    def vmap_scatter(rows, lin):
        dv = jnp.zeros((B, H * W, 4 * D), jnp.float32)
        return jax.vmap(lambda acc, i_, r_: acc.at[i_].add(r_))(
            dv, lin, rows.astype(jnp.float32))

    f = jax.jit(vmap_scatter)
    results["scatter vmap [1,128] f32  "] = (timed(f, rows, lin), n_idx)

    rowsf = rows.reshape(B * Q * P, 4 * D)

    def flat_scatter(rowsf, linf):
        dv = jnp.zeros((B * H * W, 4 * D), jnp.float32)
        return dv.at[linf].add(rowsf.astype(jnp.float32))

    f = jax.jit(flat_scatter)
    results["scatter flat [1,128] f32  "] = (timed(f, rowsf, linf), n_idx)

    def flat_scatter_sorted(rowsf, linf):
        order = jnp.argsort(linf)
        dv = jnp.zeros((B * H * W, 4 * D), jnp.float32)
        return dv.at[linf[order]].add(
            rowsf[order].astype(jnp.float32),
            indices_are_sorted=True, unique_indices=False)

    f = jax.jit(flat_scatter_sorted)
    results["scatter flat sorted f32   "] = (timed(f, rowsf, linf), n_idx)

    print(f"\n{'variant':30s} {'ms':>8s} {'ns/index':>9s}")
    for k, (dt, n) in results.items():
        print(f"{k:30s} {dt * 1e3:8.2f} {dt / n * 1e9:9.2f}")


if __name__ == "__main__":
    main()
