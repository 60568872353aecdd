"""Bilinear/nearest resize parity vs torch F.interpolate."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from wesup_tpu.ops.resize import resize_bilinear, resize_nearest


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((7, 9), (21, 27)),
    ((16, 16), (5, 3)),
    ((13, 22), (104, 176)),
    ((1, 5), (4, 10)),
    ((8, 8), (8, 8)),
])
def test_bilinear_matches_torch(align_corners, in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)

    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw,
                                      align_corners=align_corners))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_hw, mode="bilinear",
                        align_corners=align_corners)
    ref = ref.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_bilinear_out_size_one_align_corners():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    out = resize_bilinear(x, (1, 1), align_corners=True)
    xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=(1, 1), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(out).ravel(), ref.numpy().ravel(),
                               atol=1e-6)


@pytest.mark.parametrize("in_hw,out_hw", [((7, 9), (21, 27)), ((16, 12), (5, 3))])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, *in_hw, 2)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_hw, mode="nearest")
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(ours, ref)
