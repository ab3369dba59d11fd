from gan_inpainting_tpu.ops.conv import conv2d  # noqa: F401
from gan_inpainting_tpu.ops.dispatch import (  # noqa: F401
    resolve_backend,
    override_backend,
)
from gan_inpainting_tpu.ops.gated_conv import gated_conv  # noqa: F401
from gan_inpainting_tpu.ops.partial_conv import partial_conv  # noqa: F401
from gan_inpainting_tpu.ops.contextual_attention import (  # noqa: F401
    contextual_attention,
)
from gan_inpainting_tpu.ops.patches import (  # noqa: F401
    extract_patches,
    fold_patches,
    same_pads,
)
