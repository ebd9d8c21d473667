from ladi_vton_tpu.metrics.ssim import ssim
from ladi_vton_tpu.metrics.fid import (
    frechet_distance,
    gaussian_stats,
    kid_mmd2,
    inception_score,
)
