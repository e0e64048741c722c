"""Microbench: im2col construction + row-form weighted reduction vs patch-form.

One encoder level at eval shapes: nm=8, lq=43008, P=4, D=32, map 128x256.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tracing import trace_op

NM, H, W, LQ, P, D = 8, 128, 256, 43008, 4, 32
R = NM * LQ * P


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(NM, H, W, D), jnp.bfloat16)
    lin = jnp.asarray(rng.randint(0, NM * (H - 2) * (W - 2), (R,)), jnp.int32)
    wgt4 = jnp.asarray(rng.rand(R, 4), jnp.bfloat16)
    gdummy = jnp.asarray(rng.randn(8, 8), jnp.bfloat16)

    def im2col(img, _):
        b, h, w, d = img.shape
        z_r = jnp.zeros((b, h, 1, d), img.dtype)
        z_b = jnp.zeros((b, 1, w, d), img.dtype)
        sx = jnp.concatenate([img[:, :, 1:], z_r], axis=2)
        sy = jnp.concatenate([img[:, 1:], z_b], axis=1)
        sxy = jnp.concatenate([sx[:, 1:], z_b], axis=1)
        return jnp.concatenate([img, sx, sy, sxy], axis=-1).reshape(b * h * w, 4 * d)

    t = trace_op(jax.jit(im2col), img, gdummy)
    print(f"im2col 4-lane-concat: {t['TOTAL']:.2f} ms  {t}")

    tab = jax.jit(im2col)(img, gdummy)

    def flat_gather(tab, lin):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
        return jax.lax.gather(tab, lin[:, None], dimension_numbers=dn,
                              slice_sizes=(1, tab.shape[-1]),
                              mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    # old patch-form reduce: reshape rows to (2,2,D), multiply, sum
    def patch_reduce(tab, lin):
        rows = flat_gather(tab, lin)  # [R, 128]
        patches = rows.reshape(NM, LQ, P, 2, 2, D)
        w = wgt4.reshape(NM, LQ, P, 2, 2).astype(jnp.float32)
        return jnp.sum(w.astype(jnp.bfloat16)[..., None] * patches,
                       axis=(2, 3, 4), dtype=jnp.float32)

    t = trace_op(jax.jit(patch_reduce), tab, lin)
    print(f"gather+patch-form reduce: {t['TOTAL']:.2f} ms  {t}")

    # new row-form reduce: expander matmul + block-sum matmuls, all [*,128/512] lanes
    E = jnp.asarray(np.repeat(np.eye(4), D, axis=1), jnp.bfloat16)  # [4, 128]
    BS = jnp.asarray(np.tile(np.eye(D), (16, 1)), jnp.bfloat16)     # [512, 32]

    def row_reduce(tab, lin):
        rows = flat_gather(tab, lin)          # [R, 128]
        wexp = wgt4 @ E                       # [R, 128]
        prod = rows * wexp                    # [R, 128]
        prod = prod.reshape(R // P, P * 4 * D)  # [nm*lq, 512]
        return jax.lax.dot_general(
            prod, BS, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [nm*lq, 32]

    t = trace_op(jax.jit(row_reduce), tab, lin)
    print(f"gather+row-form reduce:   {t['TOTAL']:.2f} ms  {t}")

    # row-form without the reshape (P folded by two matmuls)
    BS1 = jnp.asarray(np.tile(np.eye(D), (4, 1)), jnp.bfloat16)  # [128, 32]

    def row_reduce2(tab, lin):
        rows = flat_gather(tab, lin)
        wexp = wgt4 @ E
        part = jax.lax.dot_general(rows * wexp, BS1, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # [R, 32]
        return part.reshape(NM, LQ, P, D).sum(2)

    t = trace_op(jax.jit(row_reduce2), tab, lin)
    print(f"gather+row-form v2:       {t['TOTAL']:.2f} ms  {t}")


if __name__ == "__main__":
    main()
