from gan_inpainting_tpu.infer.inpaint import Inpainter, inpaint  # noqa: F401
