"""Bit-exactness of the device-side train resize (ops/train_resize.py).

The device path must reproduce cv2.resize(INTER_LINEAR uint8 fixed-point /
INTER_NEAREST) + loader.place_on_canvas EXACTLY — that is what keeps train
histories byte-identical when the per-epoch resize moves into the jitted
step (reference host pipeline: utils/data.py:24-30 resize semantics).
"""

import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from make_dataset import make_dataset  # noqa: E402

from wesup_tpu.data.loader import (CanvasSpec, _blank_meta_item,
                                   place_meta_on_canvas, place_on_canvas)
from wesup_tpu.ops import train_resize


def _stack_items(items):
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def _cache_from(imgs, masks):
    h0 = max(i.shape[0] for i in imgs)
    w0 = max(i.shape[1] for i in imgs)
    c = {"imgs": np.zeros((len(imgs), h0, w0, 3), np.uint8),
         "masks": np.zeros((len(imgs), h0, w0), np.int8)}
    for i, (im, m) in enumerate(zip(imgs, masks)):
        c["imgs"][i, :im.shape[0], :im.shape[1]] = im
        c["masks"][i, :m.shape[0], :m.shape[1]] = m
    return c


def test_apply_resize_bit_exact_vs_cv2():
    """Random full-res shapes and shrink targets, mixed in one batch."""
    rng = np.random.default_rng(0)
    spec = CanvasSpec(96, 128)
    imgs, masks, metas, hosts = [], [], [], []
    for i in range(6):
        h0, w0 = int(rng.integers(40, 200)), int(rng.integers(40, 200))
        s = float(rng.uniform(0.3, 0.45))
        th, tw = int(np.ceil(s * h0)), int(np.ceil(s * w0))
        img = rng.integers(0, 256, (h0, w0, 3), np.uint8)
        mask = rng.integers(0, 2, (h0, w0), np.int32)
        imgs.append(img)
        masks.append(mask)
        metas.append(place_meta_on_canvas(
            {"img_idx": i, "full_hw": (h0, w0), "target_hw": (th, tw),
             "points": None, "use_mask_as_points": False}, spec))
        hosts.append(place_on_canvas(
            {"image": cv2.resize(img, (tw, th),
                                 interpolation=cv2.INTER_LINEAR),
             "pixel_mask": cv2.resize(mask.astype(np.uint8), (tw, th),
                                      interpolation=cv2.INTER_NEAREST
                                      ).astype(np.int32),
             "points": None, "use_mask_as_points": False}, spec))
    metas.append(_blank_meta_item(spec))

    import jax

    batch = jax.tree.map(lambda x: np.asarray(x), _stack_items(metas))
    got_img, got_mask = jax.jit(train_resize.apply_resize)(
        _cache_from(imgs, masks), batch)
    got_img, got_mask = np.asarray(got_img), np.asarray(got_mask)

    for b, host in enumerate(hosts):
        np.testing.assert_array_equal(got_img[b], host["image"],
                                      err_msg=f"image {b}")
        np.testing.assert_array_equal(got_mask[b],
                                      host["pixel_mask"].astype(np.int32),
                                      err_msg=f"mask {b}")
    # the batch-padding blank: zero image, all -1 mask (loader._blank_item)
    assert (got_img[-1] == 0).all()
    assert (got_mask[-1] == -1).all()


def test_resize_vectors_identity_scale():
    """Scale 1 must be the identity (cv2 preserves it; so must we)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (33, 47, 3), np.uint8)
    mask = rng.integers(0, 2, (33, 47), np.int32)
    spec = CanvasSpec(48, 64)
    meta = place_meta_on_canvas(
        {"img_idx": 0, "full_hw": (33, 47), "target_hw": (33, 47),
         "points": None, "use_mask_as_points": False}, spec)

    import jax

    got_img, got_mask = jax.jit(train_resize.apply_resize)(
        _cache_from([img], [mask]), _stack_items([meta]))
    np.testing.assert_array_equal(np.asarray(got_img)[0, :33, :47], img)
    # edge replication beyond content (place_on_canvas semantics)
    np.testing.assert_array_equal(np.asarray(got_img)[0, 40, :47],
                                  img[32, :])
    np.testing.assert_array_equal(np.asarray(got_mask)[0, :33, :47], mask)
    assert (np.asarray(got_mask)[0, 33:, :] == -1).all()


def test_build_cache_fallbacks():
    class FakeDS:
        contour = False

        def __init__(self, masks):
            self._m = masks

        def __len__(self):
            return len(self._m)

        def full_res_item(self, i):
            return {"image": np.zeros((8, 8, 3), np.uint8),
                    "pixel_mask": self._m[i]}

    ok = train_resize.build_cache(FakeDS([np.zeros((8, 8), np.int32)]))
    assert ok is not None and ok["imgs"].shape == (1, 8, 8, 3)
    # mask values beyond int8 -> host fallback
    assert train_resize.build_cache(
        FakeDS([np.full((8, 8), 255, np.int32)])) is None
    # missing mask -> host fallback
    assert train_resize.build_cache(FakeDS([None])) is None
    # size cap -> host fallback
    assert train_resize.build_cache(
        FakeDS([np.zeros((8, 8), np.int32)]), max_bytes=10) is None


def test_bucketed_batching_groups_like_host(tmp_path):
    """Bucket assignment must come from the TARGET size in device mode so
    batch composition (and thus histories) matches the host path."""
    root = tmp_path / "ds"
    make_dataset(root, n_train=6, n_val=0, hw=(96, 128))
    from wesup_tpu.data.datasets import PointSupervisionDataset
    from wesup_tpu.data.loader import CanvasBatcher

    def batches(device_mode):
        ds = PointSupervisionDataset(root / "train",
                                     multiscale_range=(0.3, 0.6), seed=3)
        ds.device_resize = device_mode
        bat = CanvasBatcher(ds, CanvasSpec(96, 128), batch_size=2,
                            shuffle=True, seed=0, bucket=True)
        out = []
        for b in bat.epoch_iter(0):
            key = ("img_idx" if device_mode else "image")
            hw = ((b["rsz_iy"].shape[1], b["rsz_ix"].shape[1])
                  if device_mode else b["image"].shape[1:3])
            out.append((tuple(hw), b["content_hw"].tolist(),
                        b["sample_valid"].tolist(), key in b))
        return out

    host = batches(False)
    dev = batches(True)
    assert len(host) == len(dev)
    for (hw_h, chw_h, sv_h, _), (hw_d, chw_d, sv_d, has_meta) in zip(host,
                                                                     dev):
        assert has_meta
        assert hw_h == hw_d
        assert chw_h == chw_d
        assert sv_h == sv_d


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_dres")
    return make_dataset(root, n_train=3, n_val=2, hw=(64, 80))


def test_history_byte_parity_device_vs_host(dataset, tmp_path, monkeypatch):
    """Full 2-epoch trainings, device vs host resize: identical histories."""
    from wesup_tpu.models import initialize_trainer

    hists = {}
    for mode in ("off", "on"):
        monkeypatch.setenv("RECORD_ROOT", str(tmp_path / f"rec_{mode}"))
        trainer = initialize_trainer(
            "wesup", epochs=2, canvas_size=(48, 64), slic_iters=3,
            compute_dtype="float32", sp_area=100, device_resize=mode)
        trainer.train(dataset, epochs=2)
        if mode == "on":
            assert trainer._resize_cache["train"] is not None, \
                "device path did not engage"
        hists[mode] = (trainer.record_dir / "history.csv").read_bytes()
    assert hists["on"] == hists["off"]
