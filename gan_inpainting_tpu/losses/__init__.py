from gan_inpainting_tpu.losses.adversarial import (  # noqa: F401
    d_loss,
    g_loss,
    r1_penalty,
)
from gan_inpainting_tpu.losses.reconstruction import (  # noqa: F401
    l1_loss,
    spatial_discount_mask,
    tv_loss,
)
from gan_inpainting_tpu.losses.perceptual import (  # noqa: F401
    VGG16Features,
    gram_matrix,
    perceptual_and_style_loss,
)
