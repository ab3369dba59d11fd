from gan_inpainting_tpu.metrics.image import psnr, ssim  # noqa: F401
