"""gan_inpainting_tpu — a TPU-native GAN image-inpainting framework.

A ground-up JAX/XLA/Pallas re-design of the capability set of the reference
``abeytheo/gan-inpainting`` PyTorch project (see SURVEY.md; the reference
checkout was unavailable, so parity targets derive from BASELINE.json):

* fused, jit-compiled preprocessing + on-device mask synthesis
  (center-crop and free-form stroke masks) — :mod:`gan_inpainting_tpu.data`
* dilated / gated / partial-conv encoder–decoder generators with
  contextual-attention patch matching — :mod:`gan_inpainting_tpu.models`,
  with Pallas TPU kernels in :mod:`gan_inpainting_tpu.ops`
* PatchGAN / SN-PatchGAN discriminators and hinge/BCE + L1 + VGG
  perceptual/style losses — :mod:`gan_inpainting_tpu.losses`
* alternating G/D training under a single jit with data-parallel sharding
  over a device mesh — :mod:`gan_inpainting_tpu.train`,
  :mod:`gan_inpainting_tpu.parallel`
* ``inpaint(image, mask)`` inference API and a batched multi-chip serving
  path — :mod:`gan_inpainting_tpu.infer`
* PSNR/SSIM eval — :mod:`gan_inpainting_tpu.metrics`
"""

__version__ = "0.1.0"

from gan_inpainting_tpu.infer.inpaint import inpaint, Inpainter  # noqa: F401
