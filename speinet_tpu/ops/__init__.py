from speinet_tpu.ops.filters import (
    box_kernel,
    richardson_lucy,
    sobel_magnitude,
    laplacian_filter,
    mean_filter,
    wiener_deconv,
)
from speinet_tpu.ops.resize import bicubic_upsample
from speinet_tpu.ops.patch_ops import unfold, fold, gather_fold
from speinet_tpu.ops.metrics import psnr_shave, psnr_uint8, ssim_matlab
