from gan_inpainting_tpu.utils.dtypes import DTypePolicy, default_policy  # noqa: F401
from gan_inpainting_tpu.utils.rng import RngStream  # noqa: F401
