from gan_inpainting_tpu.metrics.image import psnr, ssim  # noqa: F401
from gan_inpainting_tpu.metrics.swd import swd  # noqa: F401
