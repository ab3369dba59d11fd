from gan_inpainting_tpu.data.masks import (  # noqa: F401
    center_mask,
    freeform_mask,
    random_mask,
    random_mask_batch,
)
from gan_inpainting_tpu.data.pipeline import (  # noqa: F401
    Batch,
    make_train_batch,
    normalize,
    denormalize,
)
from gan_inpainting_tpu.data.synthetic import synthetic_batch, synthetic_image  # noqa: F401
from gan_inpainting_tpu.data.loader import make_dataset  # noqa: F401
