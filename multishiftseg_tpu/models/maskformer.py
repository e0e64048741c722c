"""MaskFormer meta-architecture (Mask2Anomaly variant) — backbone -> pixel decoder ->
GMA transformer decoder, plus semantic / anomaly inference.

Behavioural port of the reference ``MaskFormer`` (``maskformer_model.py:21-451``) and
``TrainM2FOOD.get_anomaly_score`` (``train_m2f.py:387-407``), redesigned functionally:
the module returns the raw prediction dict; inference helpers are pure functions so the
upsample + einsum + max fuse into one XLA program. Image normalization and
pad-to-divisibility (``ImageList.from_tensors``, size_divisibility 32) happen in
``preprocess`` with static shapes.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize_bilinear, resize_bilinear_nchw
from ..ops.scores import mask2former_anomaly_score, mask2former_semantic_logits
from .pixel_decoder import MSDeformAttnPixelDecoder
from .resnet import ResNet
from .swin import SwinTransformer, SWIN_CONFIGS
from .transformer_decoder import MultiScaleMaskedTransformerDecoderGMA

PIXEL_MEAN = (123.675, 116.280, 103.530)
PIXEL_STD = (58.395, 57.120, 57.375)
SIZE_DIVISIBILITY = 32


class MaskFormer(nn.Module):
    """Returns the prediction dict of the selected decoder on preprocessed images.

    ``pixel_decoder`` selects among the registered alternatives (reference registry
    names): 'msdeformattn' (MSDeformAttnPixelDecoder, the shipped config), 'fpn'
    (BasePixelDecoder), 'transformer_encoder' (MaskFormer-v1).
    ``predictor``: 'gma' (MultiScaleMaskedTransformerDecoder_GMA, dual OOD heads),
    'vanilla' (MultiScaleMaskedTransformerDecoder), or 'standard'
    (StandardTransformerDecoder — MaskFormer-v1, fed the encoder feature like the
    reference's ``transformer_in_feature: transformer_encoder`` wiring,
    ``mask_former_head.py:100-115``).
    """

    num_classes: int = 19
    backbone: str = "resnet50"  # resnet50 | resnet101 | swin_{tiny,small,base,large}
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    mask_dim: int = 256
    transformer_enc_layers: int = 6
    pixel_decoder: str = "msdeformattn"
    predictor: str = "gma"
    dtype: Optional[jnp.dtype] = None
    # int8 deformable value table (accuracy-gated eval fast path; see
    # test_ms_deform_attn.py::test_int8_table_accuracy_gate)
    quantize_deform_table: bool = False
    # approximate deformable sampling (accuracy-gated eval fast paths; see
    # test_ms_deform_attn.py): "nearest", "nearest_top{T}", "shared" — or a
    # per-encoder-layer tuple (hybrid: e.g. exact early, approximate late)
    deform_sample_mode: Union[str, Tuple[str, ...]] = "bilinear"
    # GPipe pipeline parallelism for the deformable encoder stack (msdeformattn
    # pixel decoder only; cfg.train.pipeline_parallel wires these in the
    # trainers — see core/pipeline.py and models/pixel_decoder.py)
    pipe_mesh: Optional[jax.sharding.Mesh] = None
    pipe_n_micro: int = 1
    pipe_x_spec: Tuple[Optional[str], ...] = ()

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        """images: [N, H, W, 3], already normalized + padded to /32."""
        if self.backbone.startswith("resnet"):
            feats = ResNet(depth=int(self.backbone[6:]), dtype=self.dtype,
                           name="backbone")(images)
        elif self.backbone.startswith("swin"):
            feats = SwinTransformer(
                **SWIN_CONFIGS[self.backbone.split("_", 1)[1]], dtype=self.dtype,
                name="backbone",
            )(images, train=train)
        else:
            raise ValueError(f"unknown backbone {self.backbone}")

        if self.pixel_decoder == "msdeformattn":
            mask_features, encoder_feat, multi_scale = MSDeformAttnPixelDecoder(
                conv_dim=self.hidden_dim, mask_dim=self.mask_dim,
                transformer_enc_layers=self.transformer_enc_layers,
                dtype=self.dtype, name="pixel_decoder",
                quantize_table=self.quantize_deform_table,
                sample_mode=self.deform_sample_mode,
                pipe_mesh=self.pipe_mesh, pipe_n_micro=self.pipe_n_micro,
                pipe_x_spec=self.pipe_x_spec,
            )(feats, train=train)
        elif self.pixel_decoder == "fpn":
            from .fpn_decoder import BasePixelDecoder

            mask_features, encoder_feat, multi_scale = BasePixelDecoder(
                conv_dim=self.hidden_dim, mask_dim=self.mask_dim,
                dtype=self.dtype, name="pixel_decoder",
            )(feats)
        elif self.pixel_decoder == "transformer_encoder":
            from .fpn_decoder import TransformerEncoderPixelDecoder

            mask_features, encoder_feat, multi_scale = TransformerEncoderPixelDecoder(
                conv_dim=self.hidden_dim, mask_dim=self.mask_dim,
                transformer_enc_layers=self.transformer_enc_layers,
                dtype=self.dtype, name="pixel_decoder",
            )(feats)
        else:
            raise ValueError(f"unknown pixel_decoder {self.pixel_decoder}")

        decoder_kwargs = dict(
            num_classes=self.num_classes, hidden_dim=self.hidden_dim,
            num_queries=self.num_queries, nheads=self.nheads,
            dim_feedforward=self.dim_feedforward, dec_layers=self.dec_layers,
            mask_dim=self.mask_dim, dtype=self.dtype, name="predictor",
        )
        if self.predictor == "gma":
            return MultiScaleMaskedTransformerDecoderGMA(**decoder_kwargs)(
                multi_scale, mask_features
            )
        elif self.predictor == "vanilla":
            from .transformer_decoder import MultiScaleMaskedTransformerDecoder

            return MultiScaleMaskedTransformerDecoder(**decoder_kwargs)(
                multi_scale, mask_features
            )
        elif self.predictor == "standard":
            from .maskformer_v1_decoder import StandardTransformerDecoder

            return StandardTransformerDecoder(**decoder_kwargs)(
                encoder_feat, mask_features
            )
        raise ValueError(f"unknown predictor {self.predictor}")


def preprocess(
    images_uint8: jax.Array,
    pixel_mean: Tuple[float, ...] = PIXEL_MEAN,
    pixel_std: Tuple[float, ...] = PIXEL_STD,
) -> jax.Array:
    """Normalize [N, H, W, 3] RGB (0-255) and pad bottom/right to /32
    (``ImageList.from_tensors``, ``maskformer_model.py:231``)."""
    x = (images_uint8.astype(jnp.float32) - jnp.asarray(pixel_mean)) / jnp.asarray(pixel_std)
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % SIZE_DIVISIBILITY
    pw = (-w) % SIZE_DIVISIBILITY
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x


def semantic_inference(
    class_logits: jax.Array,  # [N, Q, K+1]
    mask_logits_up: jax.Array,  # [N, Q, H, W] upsampled to image size
    num_classes: int = 19,
) -> jax.Array:
    """Mask2Anomaly semantic inference (``maskformer_model.py:341-354``): softmax x
    sigmoid einsum, concatenated with high-confidence (score>0.95, 1<label<11)
    per-query masks. Returns [N, K + Q, H, W] — channels past K are the zero-or-kept
    extra masks (kept queries weighted by score, others zeroed), so downstream
    ``logit[:, :19]`` slicing matches the reference."""
    probs = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)
    sem = mask2former_semantic_logits(class_logits, mask_logits_up)  # [N, H, W, K]
    scores = jnp.max(probs, axis=-1)  # [N, Q]
    labels = jnp.argmax(probs, axis=-1)
    keep = (labels != num_classes) & (scores > 0.95) & (labels < 11) & (labels > 1)
    mask_probs = jax.nn.sigmoid(mask_logits_up.astype(jnp.float32))
    extra = mask_probs * jnp.where(keep, scores, 0.0)[:, :, None, None]
    sem_chw = sem.transpose(0, 3, 1, 2)  # [N, K, H, W]
    return jnp.concatenate([sem_chw, extra], axis=1)


def inference(
    outputs: Dict[str, jax.Array], image_hw: Tuple[int, int],
    num_classes: int = 19, score_lowres: bool = False, score_topq: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Full eval path: upsample both mask heads to the padded image size, compute
    semantic logits [N, K, H, W] (first K channels) and the anomaly score [N, H, W].

    The caller crops padding off afterwards (reference crops via ``sem_seg_postprocess``
    / ``get_anomaly_score``'s ``[:size[0], :size[1]]``).

    ``score_lowres=True`` is an APPROXIMATE fast path for the anomaly branch:
    the score is computed at the mask head's native resolution (stride 4) and
    the resulting [N, h, w] score MAP is bilinearly upsampled, instead of
    upsampling all Q=100 per-query mask logit planes before scoring. The
    sigmoid between the (linear) resize and the (linear) query einsum makes
    the reordering inexact — it softens the score only at mask boundaries —
    so like the approximate sampling modes it must be accuracy-qualified on a
    trained checkpoint before production use (tools/learning_demo.py
    --qualify_sampling; per-checkpoint gate in tools/validate_release.py).
    The exact path resizes [N, 100, 1024, 2048] f32 twice (masks + sigmoid +
    einsum read ~2.5 GB of HBM traffic at the benchmark resolution); the
    fast path does all scoring at 1/16 the pixels and resizes one plane.
    The semantic branch is unchanged (mIoU datasets keep exact parity).

    ``score_topq=Q`` is a different anomaly-branch approximation: upsample
    only the Q queries with the largest non-void class mass of the OOD head
    and drop the rest (NO renormalization — the dropped contribution to
    ``sum_q softmax_q(k) * sigmoid(mask_q)`` is bounded by the dropped
    queries' max non-void class probability, which training drives to ~0 for
    unmatched queries). Unlike ``score_lowres`` the score stays at full
    resolution — no boundary softening — while the [N, Q, H, W] resize +
    sigmoid + einsum chain shrinks Q/100. Composable with neither lowres nor
    the sem branch; qualified per checkpoint under the ``+topq{Q}`` key.
    """
    masks_up = resize_bilinear_nchw(
        outputs["pred_masks"], image_hw, align_corners=False
    )
    sem = semantic_inference(outputs["pred_logits"], masks_up, num_classes)
    if score_topq:
        probs = jax.nn.softmax(
            outputs["pred_logits_ood"].astype(jnp.float32), axis=-1)
        mass = jnp.max(probs[..., :-1], axis=-1)  # [N, Q] non-void peak
        _, q_sel = jax.lax.top_k(mass, score_topq)  # [N, Qk]
        masks_sel = jnp.take_along_axis(
            outputs["pred_masks_ood"], q_sel[:, :, None, None], axis=1)
        probs_sel = jnp.take_along_axis(probs[..., :-1], q_sel[:, :, None],
                                        axis=1)
        masks_sel_up = resize_bilinear_nchw(masks_sel, image_hw,
                                            align_corners=False)
        sem_sel = jnp.einsum(
            "bqk,bqhw->bhwk", probs_sel,
            jax.nn.sigmoid(masks_sel_up.astype(jnp.float32)))
        anomaly = 1.0 - jnp.max(sem_sel, axis=-1)
    elif score_lowres:
        anomaly_low = mask2former_anomaly_score(
            outputs["pred_logits_ood"], outputs["pred_masks_ood"]
        )
        anomaly = resize_bilinear_nchw(anomaly_low, image_hw,
                                       align_corners=False)
    else:
        masks_ood_up = resize_bilinear_nchw(
            outputs["pred_masks_ood"], image_hw, align_corners=False
        )
        anomaly = mask2former_anomaly_score(outputs["pred_logits_ood"], masks_ood_up)
    return sem, anomaly
