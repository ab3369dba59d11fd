from gan_inpainting_tpu.io.checkpoint import CheckpointManager  # noqa: F401
from gan_inpainting_tpu.io.metrics_writer import MetricsWriter  # noqa: F401
