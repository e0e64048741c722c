from .dilated_conv import dilated_conv3x3
from .ms_deform_attn import MSDeformAttn, ms_deform_attn_core
from .resize import resize_bilinear, resize_nearest
from .sampling import bilinear_sample_pixel, grid_sample, point_sample
from .scores import (
    energy_score, mask2former_anomaly_score, mask2former_semantic_logits,
)
