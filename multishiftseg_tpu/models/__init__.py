"""Model zoo.

Primary (benchmark) models:
  * :class:`~multishiftseg_tpu.models.deeplab.DeepWV3Plus` — WideResNet-38
    DeepLabV3+ with the energy-scored OOD head (reference ``deepv3.py:203-285``).
  * :class:`~multishiftseg_tpu.models.maskformer.MaskFormer` — Mask2Anomaly
    (R-50/Swin backbone, MSDeformAttn pixel decoder, GMA decoder with dual heads).

Registered alternates (reference registries, SURVEY §2.3-2.4): generic
``DeepV3Plus`` over ResNet/SEResNeXt trunks, vanilla Mask2Former decoder, FPN /
transformer-encoder pixel decoders, Swin backbones, panoptic/instance inference and
hflip TTA.
"""

from .deeplab import DeepWV3Plus, init_ood_head_from_final
from .deepv3_generic import (
    DeepR50V3PlusD_m1, DeepSRNX50V3PlusD_m1, DeepSRNX101V3PlusD_m1, DeepV3Plus,
)
from .fpn_decoder import BasePixelDecoder, TransformerEncoderPixelDecoder
from .inference_extras import hflip_tta, instance_inference, panoptic_inference
from .maskformer import MaskFormer, inference, preprocess, semantic_inference
from .pixel_decoder import MSDeformAttnPixelDecoder
from .resnet import ResNet
from .seresnext import SEResNeXt
from .swin import SWIN_CONFIGS, SwinTransformer
from .transformer_decoder import (
    MultiScaleMaskedTransformerDecoder, MultiScaleMaskedTransformerDecoderGMA,
)
from .wider_resnet import WiderResNetA2

MODEL_REGISTRY = {
    "DeepWV3Plus": DeepWV3Plus,
    "DeepV3Plus": DeepV3Plus,
    "DeepR50V3PlusD_m1": DeepR50V3PlusD_m1,
    "DeepSRNX50V3PlusD_m1": DeepSRNX50V3PlusD_m1,
    "DeepSRNX101V3PlusD_m1": DeepSRNX101V3PlusD_m1,
    "MaskFormer": MaskFormer,
}
