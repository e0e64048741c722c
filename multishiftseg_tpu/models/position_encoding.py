"""2-D sine/cosine position embeddings (DETR ``PositionEmbeddingSine``).

Behavioural port of the reference ``position_encoding.py:13-64`` with
``normalize=True`` and no padding mask (the entry-point models never pass one):
embeddings depend only on (H, W), so they are computed host-side per static shape and
closed over as constants under jit.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _position_embedding_np(h: int, w: int, num_pos_feats: int, temperature: int) -> np.ndarray:
    eps = 1e-6
    scale = 2 * math.pi
    y = np.arange(1, h + 1, dtype=np.float64)[:, None]  # cumsum of ones
    x = np.arange(1, w + 1, dtype=np.float64)[None, :]
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = np.broadcast_to(x[..., None], (h, w, num_pos_feats)) / dim_t
    pos_y = np.broadcast_to(y[..., None] * np.ones((1, w, 1)), (h, w, num_pos_feats)) / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], axis=-1).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], axis=-1).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1).astype(np.float32)  # [H, W, 2*feats]


def position_embedding_sine(h: int, w: int, channels: int = 256, temperature: int = 10000):
    """[H, W, channels] sine embedding (y features first, matching the reference)."""
    assert channels % 2 == 0
    return jnp.asarray(_position_embedding_np(h, w, channels // 2, temperature))
