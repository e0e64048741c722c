"""MSDeformAttn pixel decoder: deformable-DETR encoder over res3-5 + FPN to stride 4.

Behavioural port of the reference ``MSDeformAttnPixelDecoder``
(``modeling/pixel_decoder/msdeformattn.py:23-359``): 1x1+GN input projections (low->high
resolution order), 6 deformable encoder layers (8 heads, 4 points, ffn 1024), per-level
learned embeddings, reference points at pixel centers, then one FPN lateral step fusing
res2 down to the common stride 4 and a 1x1 ``mask_features`` head.

All padding masks are absent in the entry-point models (``msdeformattn.py:62`` builds
all-False masks), so valid ratios are identically 1 and are elided.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.ms_deform_attn import MSDeformAttn
from ..ops.resize import resize_bilinear
from .layers import Conv
from .position_encoding import position_embedding_sine


def _reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """[S, 2] normalized (x, y) pixel-center positions, concatenated over levels
    (reference ``get_reference_points``, ``msdeformattn.py:141-153`` with valid
    ratios = 1)."""
    pts = []
    for h, w in spatial_shapes:
        ys = (np.arange(h, dtype=np.float64) + 0.5) / h
        xs = (np.arange(w, dtype=np.float64) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    return np.concatenate(pts, 0).astype(np.float32)


class DeformableEncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: Optional[jnp.dtype] = None
    quantize_table: bool = False
    sample_mode: str = "bilinear"
    tag_core: bool = False  # checkpoint_name the attn core (train/remat only)

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        q = src + pos
        attn_out = MSDeformAttn(
            d_model=self.d_model, n_levels=self.n_levels, n_heads=self.n_heads,
            n_points=self.n_points, dtype=self.dtype, name="self_attn",
            quantize_table=self.quantize_table, sample_mode=self.sample_mode,
            tag_core=self.tag_core,
        )(q, reference_points, src, spatial_shapes)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + attn_out)
        ffn = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        ffn = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(ffn))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + ffn)


class MSDeformAttnPixelDecoder(nn.Module):
    conv_dim: int = 256
    mask_dim: int = 256
    transformer_enc_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    transformer_in_features: Tuple[str, ...] = ("res3", "res4", "res5")
    fpn_in_features: Tuple[str, ...] = ("res2",)  # features below the deformable levels
    common_stride: int = 4
    num_outputs: int = 3  # maskformer_num_feature_levels
    dtype: Optional[jnp.dtype] = None
    quantize_table: bool = False  # int8 deformable value table (eval fast path)
    # deformable sampling: one mode string for every encoder layer, or a
    # per-layer tuple of length transformer_enc_layers ("hybrid" eval fast
    # paths — e.g. exact early layers, approximate late layers; error injected
    # late propagates through fewer downstream layers)
    sample_mode: Union[str, Tuple[str, ...]] = "bilinear"
    # GPipe pipeline parallelism (core/pipeline.py): when pipe_mesh is set the
    # encoder stack runs stage-sharded over its 'pipe' axis with the stacked
    # param layout (pixel_decoder/encoder_stack, [n_layers, ...] leaves) —
    # converters pack/unpack_encoder_stack bridge to the named on-disk layout.
    pipe_mesh: Optional[jax.sharding.Mesh] = None
    pipe_n_micro: int = 1
    pipe_x_spec: Tuple[Optional[str], ...] = ()  # P(*pipe_x_spec) for src

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array], train: bool = False):
        """Returns (mask_features [N,H/4,W/4,mask_dim], encoder_top, multi_scale feats
        [stride32, stride16, stride8])."""
        L = len(self.transformer_in_features)
        # low -> high resolution (res5, res4, res3), matching input_proj order
        srcs, poss, shapes = [], [], []
        for idx, name in enumerate(self.transformer_in_features[::-1]):
            x = features[name]
            x = Conv(self.conv_dim, (1, 1), use_bias=True, dtype=self.dtype,
                     name=f"input_proj_{idx}")(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name=f"input_proj_{idx}_gn")(x)
            h, w = x.shape[1], x.shape[2]
            shapes.append((h, w))
            srcs.append(x.reshape(x.shape[0], h * w, self.conv_dim))
            pe = position_embedding_sine(h, w, self.conv_dim).astype(x.dtype)
            poss.append(pe.reshape(1, h * w, self.conv_dim))

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (L, self.conv_dim)
        )
        src = jnp.concatenate(srcs, axis=1)
        # batch-invariant [1, S, ...] rows (no padding masks -> identical per
        # sample); the sequential path broadcasts them, the pipelined path
        # requires them in row form (gpipe_encoder_apply refuses per-sample)
        pos1 = jnp.concatenate(
            [p + level_embed[i].astype(p.dtype) for i, p in enumerate(poss)], axis=1
        )
        ref1 = jnp.asarray(_reference_points(shapes))  # [S, 2]
        ref1 = jnp.broadcast_to(ref1[None, :, None, :], (1, ref1.shape[0], L, 2))
        n = src.shape[0]
        pos = jnp.broadcast_to(pos1, (n,) + pos1.shape[1:])
        ref = jnp.broadcast_to(ref1, (n,) + ref1.shape[1:])

        # Rematerialize each encoder layer, in BOTH modes. Training: the gather
        # VJP otherwise saves the ~[N*M, Lq, P, 2, 2, D] patch tensors of all 6
        # layers (several GB at training shapes), which exhausts HBM and faults
        # the device. Eval: remat is kept — it is the configuration all PERF.md
        # eval numbers were measured under, and same-window A/B shows it is
        # free (eval deltas from remat/tag are below the day-to-day variance of
        # the tunneled chip; see PERF.md round-3 note). Train-only policy:
        # saving the tagged deformable core output ("deform_core", ~42 MB/layer
        # bf16) DCEs the core's gather+dot chain out of the backward recompute
        # (1195 -> 945 ms/step, same-harness A/B, PERF.md); the tag is off at
        # eval to keep the measured-headline graph unchanged.
        if self.pipe_mesh is not None:
            src = self._pipelined_encoder(src, pos1, ref1, tuple(shapes), L, train)
        else:
            layer_cls = nn.remat(
                DeformableEncoderLayer, static_argnums=(4,),
                policy=(jax.checkpoint_policies.save_only_these_names("deform_core")
                        if train else None),
            )
            modes = self.sample_mode
            if isinstance(modes, str):
                modes = (modes,) * self.transformer_enc_layers
            elif len(modes) != self.transformer_enc_layers:
                raise ValueError(
                    f"per-layer sample_mode needs {self.transformer_enc_layers}"
                    f" entries, got {len(modes)}: {modes}")
            for i in range(self.transformer_enc_layers):
                src = layer_cls(
                    d_model=self.conv_dim, n_levels=L, n_heads=self.n_heads,
                    n_points=self.n_points, dtype=self.dtype, name=f"encoder_layer_{i}",
                    quantize_table=self.quantize_table, sample_mode=modes[i],
                    tag_core=train,
                )(src, pos, ref, shapes)

        # split back to 2-D maps, low -> high resolution
        outs: List[jax.Array] = []
        start = 0
        for (h, w) in shapes:
            outs.append(src[:, start : start + h * w].reshape(-1, h, w, self.conv_dim))
            start += h * w

        # FPN step(s) down to the common stride
        for idx, name in enumerate(self.fpn_in_features[::-1]):
            x = features[name]
            lateral = Conv(self.conv_dim, (1, 1), dtype=self.dtype,
                           name=f"adapter_{idx + 1}")(x)
            lateral = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                                   name=f"adapter_{idx + 1}_gn")(lateral)
            up = resize_bilinear(outs[-1], (x.shape[1], x.shape[2]), align_corners=False)
            y = lateral + up
            y = Conv(self.conv_dim, (3, 3), dtype=self.dtype, name=f"layer_{idx + 1}")(y)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name=f"layer_{idx + 1}_gn")(y)
            outs.append(nn.relu(y))

        mask_features = Conv(self.mask_dim, (1, 1), use_bias=True, dtype=self.dtype,
                             name="mask_features")(outs[-1])
        return mask_features, outs[0], outs[: self.num_outputs]

    def _pipelined_encoder(self, src, pos1, ref1, shapes, L, train):
        """GPipe the encoder stack over ``pipe_mesh``'s 'pipe' axis.

        Declares ONE stacked parameter subtree (``encoder_stack``:
        ``[n_layers, ...]`` leaves, stage-sharded by the trainer via
        ``core.mesh.tensor_parallel_shardings``) and applies the unbound
        layer template through ``gpipe_encoder_apply``. Per-layer remat with
        the same deform_core policy as the sequential path."""
        from ..core.pipeline import gpipe_encoder_apply
        from jax.sharding import PartitionSpec

        n_layers = self.transformer_enc_layers
        layer = DeformableEncoderLayer(
            d_model=self.conv_dim, n_levels=L, n_heads=self.n_heads,
            n_points=self.n_points, dtype=self.dtype,
            quantize_table=self.quantize_table, sample_mode=self.sample_mode,
            tag_core=train, parent=None,
        )

        def init_stack(rng):
            # fresh-init path (trainers init the sequential layout and
            # pack_encoder_stack it, which preserves per-layer init exactly;
            # this direct init exists for standalone model.init of a
            # pipelined model)
            keys = jax.random.split(rng, n_layers)
            ps = [layer.init(k, src[:1], pos1, ref1, shapes)["params"]
                  for k in keys]
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *ps)

        stacked = self.param("encoder_stack", init_stack)
        return gpipe_encoder_apply(
            layer, stacked, src, pos1, ref1, shapes,
            mesh=self.pipe_mesh, n_micro=self.pipe_n_micro,
            x_spec=PartitionSpec(*self.pipe_x_spec),
            remat=True,
            remat_policy=(
                jax.checkpoint_policies.save_only_these_names("deform_core")
                if train else None),
        )
