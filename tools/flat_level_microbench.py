"""Prototype one encoder level of the fully-flat deformable pipeline.

All per-point scalars live as [n*lq, M*P]-lane arrays; corner weights are expanded
straight into [R, 4D] with lane-iota; the weighted reduce is a block-sum matmul.
Compare against the 5.6 ms/level row-form v2 (reduce_microbench.py).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tracing import trace_op

N, M, P, D = 1, 8, 4, 32
H, W = 128, 256
LQ = 43008
MP = M * P
R = N * LQ * MP


def main():
    rng = np.random.RandomState(0)
    # module-side natural tensors
    img = jnp.asarray(rng.randn(N * M, H, W, D), jnp.bfloat16)
    locx = jnp.asarray(rng.rand(N * LQ, MP), jnp.float32)  # normalized [0,1]
    locy = jnp.asarray(rng.rand(N * LQ, MP), jnp.float32)
    attn = jnp.asarray(rng.rand(N * LQ, MP), jnp.float32)

    E = jnp.asarray(np.repeat(np.eye(4), D, axis=1), jnp.bfloat16)
    BS = jnp.asarray(np.tile(np.eye(D), (4, 1)), jnp.bfloat16)

    lane = np.arange(4 * D)
    cy = jnp.asarray((lane // D) // 2, jnp.float32)  # corner y offset per lane
    cx = jnp.asarray((lane // D) % 2, jnp.float32)

    def im2col(img):
        b, h, w, d = img.shape
        z_r = jnp.zeros((b, h, 1, d), img.dtype)
        z_b = jnp.zeros((b, 1, w, d), img.dtype)
        sx_ = jnp.concatenate([img[:, :, 1:], z_r], axis=2)
        sy_ = jnp.concatenate([img[:, 1:], z_b], axis=1)
        sxy = jnp.concatenate([sx_[:, 1:], z_b], axis=1)
        return jnp.concatenate([img, sx_, sy_, sxy], axis=-1).reshape(b * h * w, 4 * d)

    def flat_gather(tab, lin):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
        return jax.lax.gather(tab, lin[:, None], dimension_numbers=dn,
                              slice_sizes=(1, tab.shape[-1]),
                              mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    boff_lane = jnp.asarray(
        np.repeat(np.arange(N * M) * (H * W), P)[None, :], jnp.int32
    )  # [1, MP] batch offset per lane (order m-major, p-minor)

    def level(img, locx):
        tab = im2col(img)
        x = locx * W - 0.5                      # [n*lq, MP]
        y = locy * H - 0.5
        sy = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
        sx = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
        lin = (boff_lane + sy * W + sx).reshape(-1)          # [R]
        rows = flat_gather(tab, lin)                         # [R, 4D]
        # corner weights straight into [R, 4D] lanes
        fy = (y - jnp.floor(y).clip(0, H - 2)).reshape(-1, 1)  # frac rel. window
        fx = (x - jnp.floor(x).clip(0, W - 2)).reshape(-1, 1)
        wgt = (jax.nn.relu(1.0 - jnp.abs(fy - cy))
               * jax.nn.relu(1.0 - jnp.abs(fx - cx))
               * attn.reshape(-1, 1))
        part = jax.lax.dot_general(
            rows * wgt.astype(jnp.bfloat16), BS, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [R, D]
        return part

    t = trace_op(jax.jit(level), img, locx)
    print(f"flat level pipeline: {t['TOTAL']:.2f} ms")
    for k, v in sorted(t.items(), key=lambda kv: -kv[1])[:8]:
        if k != "TOTAL":
            print(f"   {k:25s} {v:7.3f}")

    # rank-3 variant: everything [n*lq, MP, 4D] (perfect (32,128) tiles, no reshapes)
    def flat_gather3(tab, lin):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(0,), start_index_map=(0,))
        return jax.lax.gather(tab, lin[..., None], dimension_numbers=dn,
                              slice_sizes=(1, tab.shape[-1]),
                              mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    def level3(img, locx):
        tab = im2col(img)
        x = locx * W - 0.5                      # [n*lq, MP]
        y = locy * H - 0.5
        sy = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
        sx = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
        lin = boff_lane + sy * W + sx                        # [n*lq, MP]
        rows = flat_gather3(tab, lin)                        # [n*lq, MP, 4D]
        fy = (y - jnp.floor(y).clip(0, H - 2))[..., None]    # [n*lq, MP, 1]
        fx = (x - jnp.floor(x).clip(0, W - 2))[..., None]
        wgt = (jax.nn.relu(1.0 - jnp.abs(fy - cy))
               * jax.nn.relu(1.0 - jnp.abs(fx - cx))
               * attn[..., None])
        part = jax.lax.dot_general(
            rows * wgt.astype(jnp.bfloat16), BS, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [n*lq, MP, D]
        return part

    t = trace_op(jax.jit(level3), img, locx)
    print(f"rank-3 level pipeline: {t['TOTAL']:.2f} ms")
    for k, v in sorted(t.items(), key=lambda kv: -kv[1])[:8]:
        if k != "TOTAL":
            print(f"   {k:25s} {v:7.3f}")

    # rank-3, bf16 partial accumulation
    def level3b(img, locx):
        p = level3(img, locx)
        return p
    part3 = jax.jit(level3)(img, locx)

    def fold3(part, _):
        x = part.reshape(N * LQ, M, P * D)  # p into lanes
        out = jax.lax.dot_general(x, jnp.asarray(np.tile(np.eye(D), (P, 1)), jnp.float32),
                                  (((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # [n*lq, M, D]
        return out.reshape(N, LQ, M * D)

    t = trace_op(jax.jit(fold3), part3, locx)
    print(f"rank-3 final fold: {t['TOTAL']:.2f} ms")

    # final fold (once per layer, 3 levels accumulated): [R, D] -> [n, lq, m*d]
    part = jax.jit(level)(img, locx)

    BS128 = jnp.asarray(np.tile(np.eye(D), (P, 1)), jnp.float32)

    def fold(part, _):
        x = part.reshape(N * LQ * M, P * D)  # consecutive p rows -> lanes
        out = x @ BS128                       # [n*lq*m, D]
        return out.reshape(N, LQ, M * D)

    t = trace_op(jax.jit(fold), part, locx)
    print(f"final fold: {t['TOTAL']:.2f} ms")


if __name__ == "__main__":
    main()
