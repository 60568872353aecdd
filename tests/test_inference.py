"""Inference engine tests: tiling math, multiscale composition, CLIs."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

from make_dataset import make_dataset  # noqa: E402

from wesup_tpu.inference import (combine_patches_to_image,  # noqa: E402
                                 divide_image_to_patches,
                                 get_top_left_coordinates,
                                 host_resize_bilinear, host_resize_nearest)
from wesup_tpu.ops.morphology import (flip_small_regions, opening,  # noqa: E402
                                      reference_cross_selem)


def test_tile_coordinates_linspace():
    coords = get_top_left_coordinates(500, 700, 300)
    tops = sorted({t for t, _ in coords})
    lefts = sorted({l for _, l in coords})
    np.testing.assert_array_equal(tops, [0, 200])
    np.testing.assert_array_equal(lefts, [0, 200, 400])


def test_divide_combine_roundtrip_mean():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (500, 700, 3)).astype(np.uint8)
    patches = divide_image_to_patches(img, 300)
    assert patches.shape == (6, 300, 300, 3)
    # stitching constant patches returns the constant everywhere
    ones = np.ones((6, 300, 300), np.float32)
    combined = combine_patches_to_image(ones, 500, 700)
    np.testing.assert_allclose(combined, 1.0)
    # overlap averaging: stitching the original patches reproduces the image
    gray = img[..., 0].astype(np.float64)
    gpatches = np.stack([gray[t:t + 300, l:l + 300]
                         for t, l in get_top_left_coordinates(500, 700, 300)])
    combined = combine_patches_to_image(gpatches, 500, 700)
    np.testing.assert_allclose(combined, gray, atol=1e-9)


def test_reference_selem_is_off_center():
    selem = reference_cross_selem(9)
    assert selem[5].sum() == 9 and selem[:, 5].sum() == 9
    assert selem.sum() == 17  # cross with one shared pixel


def test_opening_removes_thin_structures():
    img = np.zeros((40, 40))
    img[10, 5:35] = 1  # 1-px thin line: erosion by the cross kills it
    out = opening(img, reference_cross_selem(9))
    assert out.sum() == 0
    blob = np.zeros((40, 40))
    blob[5:35, 5:35] = 1
    out = opening(blob, reference_cross_selem(9))
    assert out.sum() > 0.8 * blob.sum()


def test_flip_small_regions():
    pred = np.zeros((100, 100), np.int32)
    pred[10:60, 10:60] = 1       # big region stays
    pred[80:84, 80:84] = 1       # small island flipped to 0
    pred[30:34, 30:34] = 0       # small hole flipped to 1
    out = flip_small_regions(pred, threshold=100)
    assert out[81, 81] == 0
    assert out[31, 31] == 1
    assert out[20, 20] == 1


def test_host_resize_matches_device_convention():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.standard_normal((11, 13, 3)).astype(np.float32)
    for ac in (True, False):
        ours = host_resize_bilinear(x, (23, 29), align_corners=ac)
        ref = F.interpolate(torch.from_numpy(x).permute(2, 0, 1)[None],
                            size=(23, 29), mode="bilinear", align_corners=ac)
        np.testing.assert_allclose(ours, ref[0].permute(1, 2, 0).numpy(),
                                   atol=1e-5)
    ours = host_resize_nearest(x, (23, 29))
    ref = F.interpolate(torch.from_numpy(x).permute(2, 0, 1)[None],
                        size=(23, 29), mode="nearest")
    np.testing.assert_array_equal(ours, ref[0].permute(1, 2, 0).numpy())


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_inf")
    return make_dataset(root, n_train=2, n_val=2, hw=(64, 80))


def test_infer_cli_end_to_end(dataset, tmp_path):
    """Run the infer.py CLI path with an untrained model: outputs must be
    binary PNGs of the right size."""
    import cv2

    import infer as infer_cli

    out_dir = tmp_path / "preds"
    infer_cli.main(str(dataset / "val"), output_dir=str(out_dir),
                   scales=(0.5, 0.4), slic_iters=3, compute_dtype="float32")
    outs = sorted(out_dir.glob("*.png"))
    assert len(outs) == 2
    img = cv2.imread(str(outs[0]), cv2.IMREAD_GRAYSCALE)
    assert img.shape == (64, 80)
    assert set(np.unique(img)).issubset({0, 255})


def test_pixel_tile_cli_end_to_end(dataset, tmp_path):
    import cv2

    import pixel_infer_tile as pit

    out_dir = tmp_path / "ptile"
    pit.main(str(dataset / "val"), patch_size=48, output=str(out_dir),
             chunk=4, slic_iters=3, compute_dtype="float32")
    outs = sorted(out_dir.glob("*.png"))
    assert len(outs) == 2
    img = cv2.imread(str(outs[0]), cv2.IMREAD_GRAYSCALE)
    assert img.shape == (64, 80)


def test_infer_cli_input_size(dataset, tmp_path):
    """input_size mode (DP2019 uses input_size=(400,400), reference
    infer.py:66-69): single fixed-size forward, no multi-scale fusion."""
    import cv2

    import infer as infer_cli

    out_dir = tmp_path / "preds_is"
    infer_cli.main(str(dataset / "val"), output_dir=str(out_dir),
                   input_size=(48, 64), slic_iters=3, compute_dtype="float32")
    outs = sorted(out_dir.glob("*.png"))
    assert len(outs) == 2
    img = cv2.imread(str(outs[0]), cv2.IMREAD_GRAYSCALE)
    assert img.shape == (64, 80)
    assert set(np.unique(img)).issubset({0, 255})
