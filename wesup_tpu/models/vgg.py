"""VGG16 feature backbone in pure JAX (NHWC, functional params pytree).

Reproduces torchvision's ``vgg16().features`` (used by the reference at
models/wesup.py:199) so that converted torch checkpoints produce identical
activations.  Returns the 13 *pre-ReLU* conv outputs: the reference's forward
hooks are registered on the Conv2d modules themselves
(models/wesup.py:205-210), so the hypercolumn taps see conv outputs BEFORE
the in-place ReLU.

No pretrained-weight download happens here (this environment has no network
egress and no torchvision); use :func:`convert_torch_state_dict` to import a
torchvision ``vgg16`` checkpoint, or He initialization by default.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 'D' configuration
VGG16_CFG: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                    512, 512, 512, "M", 512, 512, 512, "M")

# output channels of the 13 convs, in order
CONV_CHANNELS: List[int] = [c for c in VGG16_CFG if c != "M"]

# index of the torchvision `features` module for each conv (for conversion)
TORCH_CONV_INDICES: List[int] = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]

# number of pooling layers *before* each conv -> its resolution level (0..4)
CONV_STAGE: List[int] = [0, 0, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4]

# hypercolumn channel count after halving side convs: sum(c // 2) == 2112
FM_CHANNELS_SUM: int = sum(c // 2 for c in CONV_CHANNELS)


def init_params(key: jax.Array, dtype=jnp.float32) -> dict:
    """He-normal initialized backbone params: {'conv{i}': {'w','b'}}.

    Kernel layout is HWIO (NHWC convolution).
    """
    params = {}
    in_ch = 3
    for i, out_ch in enumerate(CONV_CHANNELS):
        key, k1 = jax.random.split(key)
        fan_in = 3 * 3 * in_ch
        w = jax.random.normal(k1, (3, 3, in_ch, out_ch), dtype) * np.sqrt(2.0 / fan_in)
        params[f"conv{i}"] = {"w": w, "b": jnp.zeros((out_ch,), dtype)}
        in_ch = out_ch
    return params


def _conv(x, w, b):
    # Uniform dtype in/out: TPU MXU accumulates bf16 products in f32
    # internally, and mixing bf16 operands with a f32
    # preferred_element_type breaks the conv VJP in jax 0.9.
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + b.astype(x.dtype)).astype(x.dtype)


def _maxpool2(x):
    # torch MaxPool2d(2, 2) with ceil_mode=False == VALID reduce_window
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _fused_pool1_ok(pre) -> bool:
    """Use the fused relu+maxpool+pad Pallas kernel for the stage-1 pool?

    Default OFF: measured a NET REGRESSION in the full predict step (17.4
    -> 18.5 ms at B=8 288x416, PERF_NOTES item 42) — the kernel itself is
    exact and fast, but pallas_call only accepts default-layout operands
    while XLA keeps the stage-1 activations in (C, B, W, H)-minor layouts,
    so three relayout copies (~1.6 ms) appear around the kernel and eat
    the ~1.4 ms pad it deletes.  ``WESUP_FUSED_POOL1=1`` opts in for
    remeasurement (TPU-only, single-process, 64 -> 128 channel pools).
    """
    import os

    if os.environ.get("WESUP_FUSED_POOL1", "0") != "1":
        return False
    if jax.default_backend() != "tpu" or len(jax.devices()) != 1:
        return False
    from ..ops import pool_pallas

    return pre.shape[-1] == 64 and pool_pallas.supports(pre.shape,
                                                        out_channels=128)


def backbone_features(params: dict, img: jnp.ndarray,
                      compute_dtype=jnp.float32) -> List[jnp.ndarray]:
    """Run VGG16 features on (B, H, W, 3) input in [0, 1].

    Returns the 13 pre-ReLU conv outputs (each (B, Hs, Ws, Cs)).  The
    reference feeds raw ``to_tensor`` images with no ImageNet normalization
    (utils/data.py:136, models/wesup.py:279) — we keep that behavior.
    """
    x = img.astype(compute_dtype)
    taps = []
    i = 0
    for c in VGG16_CFG:
        if c == "M":
            if taps and _fused_pool1_ok(taps[-1]):
                # one fused pass over the PRE-ReLU tap: relu + pool +
                # zero-pad to the next conv's 128-lane width (exact; the
                # consumer conv's weight is zero-padded to match below)
                from ..ops import pool_pallas

                x = pool_pallas.fused_relu_pool_pad(taps[-1], 128)
            else:
                x = _maxpool2(x)
        else:
            p = params[f"conv{i}"]
            w = p["w"]
            if w.shape[2] != x.shape[-1]:
                # input widened with structural zeros by the fused pool:
                # zero-pad the kernel's input channels to match (exact —
                # the MXU pads 64 -> 128 lanes internally either way)
                w = jnp.pad(
                    w, ((0, 0), (0, 0), (0, x.shape[-1] - w.shape[2]), (0, 0)))
            pre = _conv(x, w, p["b"])
            taps.append(pre)
            x = jax.nn.relu(pre)
            i += 1
    return taps


def convert_torch_state_dict(state_dict) -> dict:
    """Convert a torchvision vgg16 (or reference WESUP checkpoint) backbone.

    Accepts keys like ``features.0.weight`` (torchvision) or
    ``backbone.0.weight`` (reference WESUP state_dict, models/wesup.py:199).
    Torch kernels are OIHW; we transpose to HWIO.
    """
    import numpy as _np

    params = {}
    for i, ti in enumerate(TORCH_CONV_INDICES):
        w = b = None
        for prefix in ("features", "backbone"):
            wk, bk = f"{prefix}.{ti}.weight", f"{prefix}.{ti}.bias"
            if wk in state_dict:
                w, b = state_dict[wk], state_dict[bk]
                break
        if w is None:
            raise KeyError(f"no weights found for conv layer {ti}")
        w = _np.asarray(w, dtype=_np.float32)
        b = _np.asarray(b, dtype=_np.float32)
        params[f"conv{i}"] = {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            "b": jnp.asarray(b),
        }
    return params
