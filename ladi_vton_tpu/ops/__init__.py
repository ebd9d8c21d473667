from ladi_vton_tpu.ops.grid_sample import grid_sample
from ladi_vton_tpu.ops.resize import resize_bilinear, resize_nearest
from ladi_vton_tpu.ops.attention import dot_product_attention
from ladi_vton_tpu.ops.morphology import dilate
from ladi_vton_tpu.ops.group_norm import group_norm_silu
