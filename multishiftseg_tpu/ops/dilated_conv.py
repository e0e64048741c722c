"""Large-dilation 3x3 convolution as nine shifted dense matmuls.

ASPP's output-stride-8 branches run 3x3 convs with dilation 12/24/36 over 4096
channels (reference ``deepv3.py:47-72``). XLA:TPU lowers large-dilation convs poorly
(~12% MFU measured on v5e — the 49x49/73x73 effective footprints defeat its tiling),
while the algebraically-identical sum of nine shifted [HW, Cin] x [Cin, Cout] matmuls
runs at dense-matmul MFU. Zero-padding shifts reproduce the conv's zero padding
exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def dilated_conv3x3(x: jax.Array, kernel: jax.Array, rate: int) -> jax.Array:
    """3x3 dilated convolution, stride 1, 'same' padding (= rate), no bias.

    Args:
      x: [N, H, W, Cin].
      kernel: [3, 3, Cin, Cout] (HWIO).
      rate: dilation.
    Returns:
      [N, H, W, Cout].
    """
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    # fp32 accumulator: the conv this replaces rounds ONCE after a single fp32
    # accumulation; summing nine bf16-rounded partials would drift several ulp
    out = jnp.zeros((n, h, w, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            dy = (ky - 1) * rate
            dx = (kx - 1) * rate
            # out[y, x] += x[y + dy, x + dx] @ W[ky, kx]  (zero beyond borders)
            src_y0, src_y1 = max(dy, 0), h + min(dy, 0)
            src_x0, src_x1 = max(dx, 0), w + min(dx, 0)
            dst_y0, dst_y1 = max(-dy, 0), h + min(-dy, 0)
            dst_x0, dst_x1 = max(-dx, 0), w + min(-dx, 0)
            if src_y0 >= src_y1 or src_x0 >= src_x1:
                continue
            piece = jnp.einsum(
                "nhwc,cd->nhwd",
                x[:, src_y0:src_y1, src_x0:src_x1],
                kernel[ky, kx].astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            out = out.at[:, dst_y0:dst_y1, dst_x0:dst_x1].add(piece)
    return out.astype(x.dtype)
