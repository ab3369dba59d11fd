from gan_inpainting_tpu.configs.base import (  # noqa: F401
    Config,
    DataConfig,
    EvalConfig,
    InferConfig,
    LossConfig,
    MaskConfig,
    ModelConfig,
    TrainConfig,
    apply_overrides,
    get_config,
    list_configs,
)
