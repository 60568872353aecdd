"""WESUP-TPU: a TPU-native rebuild of WESUP (weakly-supervised histopathology
image segmentation with sparse point annotations).

The reference implementation (mrcfps/WESUP) is a single-GPU PyTorch pipeline:
CPU skimage SLIC -> VGG16 hypercolumn -> per-superpixel MLP -> label
propagation.  This package re-designs the whole pipeline TPU-first:

- SLIC superpixel clustering runs *on device* inside the jitted train step
  (``wesup_tpu.ops.slic``), eliminating the reference's GPU->CPU->GPU round
  trip (reference: models/wesup.py:471-478).
- All shapes are static: images are padded onto per-dataset canvases with
  validity masks, and the reference's "labeled superpixels first" reordering
  (models/wesup.py:44-47) is replaced by boolean masks.
- Superpixel feature pooling is a one-hot matmul on the MXU
  (``wesup_tpu.ops.segments``), the dense form of segment-mean.
- Multi-chip scaling uses ``jax.sharding.Mesh`` + data/tensor parallel
  shardings (``wesup_tpu.parallel``), not host process pools.
"""

__version__ = "0.1.0"

from . import runtime as _runtime

_runtime.enable_compilation_cache()
