"""Multi-head attention with torch ``nn.MultiheadAttention`` semantics.

Written as explicit q/k/v/out projections so checkpoint conversion can split torch's
packed ``in_proj_weight``; supports boolean attention masks (True = disallowed) with
the all-masked-row guard the GMA decoder relies on
(reference ``mask2former_transformer_decoder.py:476-477``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    d_model: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # [N, Lq, C]
        key: jax.Array,  # [N, Lk, C]
        value: jax.Array,  # [N, Lk, C]
        attn_mask: Optional[jax.Array] = None,  # [N, H, Lq, Lk] bool, True = masked
    ) -> jax.Array:
        n, lq, _ = query.shape
        lk = key.shape[1]
        h = self.num_heads
        d = self.d_model // h

        dense = lambda name: nn.Dense(
            self.d_model, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name=name,
        )
        q = dense("q_proj")(query).reshape(n, lq, h, d)
        k = dense("k_proj")(key).reshape(n, lk, h, d)
        v = dense("v_proj")(value).reshape(n, lk, h, d)

        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k, precision=jax.lax.Precision.DEFAULT)
        logits = logits.astype(jnp.float32) / jnp.sqrt(d).astype(jnp.float32)
        if attn_mask is not None:
            # Guard rows with no allowed keys (torch would produce NaN): unmask them,
            # matching the reference's explicit row reset.
            all_masked = jnp.all(attn_mask, axis=-1, keepdims=True)
            attn_mask = attn_mask & ~all_masked
            logits = jnp.where(attn_mask, _NEG_INF, logits)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(n, lq, self.d_model)
        return dense("out_proj")(out)
