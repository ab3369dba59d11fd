from gan_inpainting_tpu.train.state import GANTrainState, create_state  # noqa: F401
from gan_inpainting_tpu.train.step import make_train_step  # noqa: F401
from gan_inpainting_tpu.train.loop import train  # noqa: F401
from gan_inpainting_tpu.train.evaluate import evaluate  # noqa: F401
