from turtlevsr_tpu.metrics.psnr_ssim import (  # noqa: F401
    calculate_psnr,
    calculate_ssim,
    psnr_255,
    ssim_gaussian,
    bgr2ycbcr,
)
