from gan_inpainting_tpu.models.layers import InpaintConv, SNConv  # noqa: F401
from gan_inpainting_tpu.models.generator import (  # noqa: F401
    build_generator,
    CoarseToFineGenerator,
    DilatedGenerator,
    GeneratorOutput,
)
from gan_inpainting_tpu.models.discriminator import (  # noqa: F401
    build_discriminator,
    PatchDiscriminator,
)
