"""Inference engine: multi-scale and tiled prediction.

Reproduces all four reference inference strategies with exact output-math
parity, but batched and device-resident:

- superpixel-wise whole image (reference infer.py:24-97): per scale,
  bilinear-resize, SLIC + forward, per-scale ROUND, nearest-resize back,
  mean over scales, round, and for multi-scale a morphological opening with
  the reference's off-center 9x9 cross (infer.py:84-92);
- pixel-wise whole image (reference pixel_infer.py:40-56): per scale,
  forward, bilinear-upsample the PROBABILITY map (align_corners=True), mean,
  round — note: no per-scale rounding here, unlike the superpixel path;
- tiled variants (reference infer_tile.py:23-91): np.linspace-spaced
  overlapping tiles, running-average stitching with an overlap counter.
  Tiles are gathered into a single batch and pushed through the model in
  device-sized chunks instead of one forward per patch.

Resizes use the same interpolation matrices as the device ops
(ops/resize._interp_matrix), i.e. exact torch F.interpolate semantics.
"""

from __future__ import annotations

import math
import os
from itertools import product

import numpy as np

from .models import steps
from .ops.morphology import opening, reference_cross_selem
from .ops.resize import _interp_matrix, _nearest_index


def _round_up(x, m=32):
    return ((x + m - 1) // m) * m


def host_resize_bilinear(img: np.ndarray, out_hw, align_corners=False):
    """(H, W, C) or (H, W) float resize, exact torch parity, on host."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W = img.shape[:2]
    A_h = _interp_matrix(H, int(out_hw[0]), align_corners)
    A_w = _interp_matrix(W, int(out_hw[1]), align_corners)
    out = np.einsum("oh,hwc->owc", A_h, img.astype(np.float32))
    out = np.einsum("pw,owc->opc", A_w, out)
    return out[..., 0] if squeeze else out


def host_resize_nearest(img: np.ndarray, out_hw):
    iy = _nearest_index(img.shape[0], int(out_hw[0]))
    ix = _nearest_index(img.shape[1], int(out_hw[1]))
    return img[iy[:, None], ix[None, :]]


class Predictor:
    """Caches jitted predict steps per canvas shape.

    Pass ``mesh`` (a jax.sharding.Mesh with a 'data' axis) to shard
    inference batches across chips: params are replicated, batches are
    placed with P('data') and padded to a shard multiple, and XLA
    partitions every step (SURVEY.md §5's tiling-over-the-mesh story —
    tile batches from predict_tiled ride the same path).
    """

    def __init__(self, params, config, mode: str = "superpixel", mesh=None):
        self.params = params
        self.config = config
        self.mode = mode
        self.mesh = mesh
        self._cache = {}
        self._scaled_cache = {}
        if mesh is not None:
            import jax
            from .parallel import param_sharding

            # param_sharding keeps everything replicated on a pure-'data'
            # mesh and tensor-parallelizes fc1/fc2 when the mesh has a
            # 'model' axis > 1 — the pixel head's (HW, 1024) matmuls are
            # where TP pays (mesh.py:9-15), so inference must not silently
            # re-replicate a trainer's TP-sharded params
            pspec = param_sharding(mesh, params)
            self.params = jax.tree.map(
                lambda x, s: jax.device_put(x, s), params, pspec)

    @property
    def data_shards(self) -> int:
        return self.mesh.shape.get("data", 1) if self.mesh is not None else 1

    def _put_batch(self, *arrays):
        """Device placement for batch-dim arrays (sharded when meshed)."""
        import jax
        import jax.numpy as jnp

        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("data"))
        return tuple(jax.device_put(np.asarray(a), sh) for a in arrays)

    def _step(self, hw):
        if hw not in self._cache:
            self._cache[hw] = steps.make_predict_step(self.config, hw, self.mode)
        return self._cache[hw]

    def _scaled_step(self, content_hw, target_hw, canvas_hw):
        key = (content_hw, target_hw, canvas_hw)
        if key not in self._scaled_cache:
            self._scaled_cache[key] = steps.make_scaled_predict_step(
                self.config, content_hw, target_hw, canvas_hw, self.mode)
        return self._scaled_cache[key]

    def dispatch_padded(self, images_f: np.ndarray):
        """Enqueue a padded forward; returns (device pred, B, h, w) WITHOUT
        fetching, so callers can keep a chunk in flight (jax dispatch is
        async — the fetch is the only blocking point)."""
        B, h, w = images_f.shape[:3]
        H, W = _round_up(h), _round_up(w)
        Bp = _round_up(B, self.data_shards)  # pad rows shard the mesh evenly
        canvas = np.zeros((Bp, H, W, 3), np.float32)
        canvas[:B, :h, :w] = images_f
        if w < W:
            canvas[:B, :h, w:] = images_f[:, :, w - 1:w]
        if h < H:
            canvas[:B, h:, :] = canvas[:B, h - 1:h, :]
        valid = np.zeros((Bp, H, W), bool)
        valid[:B, :h, :w] = True

        step = self._step((H, W))
        pred = step(self.params, *self._put_batch(canvas, valid))
        return pred, B, h, w

    def predict_padded(self, images_f: np.ndarray) -> np.ndarray:
        """(B, h, w, 3) float [0,1] -> (B, h, w) fg probability.

        Floats are fed straight through (no uint8 re-quantization; the
        reference keeps float images after F.interpolate, infer.py:74)."""
        pred, B, h, w = self.dispatch_padded(images_f)
        return np.asarray(pred)[:B, :h, :w]


def predict_multiscale(predictor: Predictor, img_u8: np.ndarray,
                       scales=(0.5,), input_size=None) -> np.ndarray:
    """Whole-image multi-scale prediction for one (H0, W0, 3) uint8 image.

    Returns the binarized (H0, W0) float mask (values 0/1)."""
    return predict_multiscale_batch(predictor, [img_u8], scales=scales,
                                    input_size=input_size)[0]


def predict_multiscale_batch(predictor: Predictor, imgs_u8, scales=(0.5,),
                             input_size=None, max_batch: int | None = None):
    """Multi-scale prediction over a list of images.

    Same-shaped images are grouped and pushed through the device as batches
    (the reference runs one forward per image per scale, infer.py:59-79) —
    on GlaS, where images share a handful of sizes, this fills the chip.
    Output math is identical to the per-image path, and invariant to the
    chunk size: WESUP_INFER_MAX_BATCH overrides the default of 8, which
    lets a driver re-run a crashed inference with different program shapes
    (the 2026-08-19 TPU worker fault was specific to one compiled shape).
    """
    if max_batch is None:
        max_batch = int(os.environ.get("WESUP_INFER_MAX_BATCH", "8"))
    sp_mode = predictor.mode == "superpixel"
    results = [None] * len(imgs_u8)

    groups = {}
    for idx, img in enumerate(imgs_u8):
        groups.setdefault(img.shape[:2], []).append(idx)

    for (H0, W0), idxs in groups.items():
        if input_size is not None:
            sizes = [tuple(input_size)]
        elif sp_mode:
            # reference superpixel path ceils (infer.py:73)
            sizes = [(math.ceil(H0 * s), math.ceil(W0 * s)) for s in scales]
        else:
            # reference pixel path floors (pixel_infer.py:44-45)
            sizes = [(int(H0 * s), int(W0 * s)) for s in scales]

        # everything (per-scale resize, model, resize back) runs on device:
        # originals are uploaded ONCE per chunk on a 32-aligned canvas.
        # PIPELINED: jax dispatch is async, so all per-scale forwards of a
        # chunk are enqueued before any result is fetched, and the NEXT
        # chunk's host canvas prep + upload overlaps the device compute of
        # the current one (one chunk in flight).
        Hc, Wc = _round_up(H0), _round_up(W0)
        acc = [None] * len(idxs)

        def dispatch(start):
            chunk = idxs[start:start + max_batch]
            n = _round_up(len(chunk), predictor.data_shards)
            canvas = np.zeros((n, Hc, Wc, 3), np.uint8)
            for j, i in enumerate(chunk):
                canvas[j, :H0, :W0] = imgs_u8[i]
            (canvas,) = predictor._put_batch(canvas)
            return start, len(chunk), [
                predictor._scaled_step((H0, W0), sz, (Hc, Wc))(
                    predictor.params, canvas) for sz in sizes]

        def drain(start, n_real, outs):
            for out in outs:
                out = np.asarray(out)
                for j in range(n_real):
                    pos = start + j
                    acc[pos] = (out[j] if acc[pos] is None
                                else acc[pos] + out[j])

        in_flight = None
        for start in range(0, len(idxs), max_batch):
            dispatched = dispatch(start)
            if in_flight is not None:
                drain(*in_flight)
            in_flight = dispatched
        if in_flight is not None:
            drain(*in_flight)

        for pos, i in enumerate(idxs):
            fused = acc[pos] / len(sizes)
            if sp_mode:
                if input_size is None:
                    fused = np.round(fused)
                    if len(scales) > 1:
                        fused = opening(fused, reference_cross_selem(9))
            else:
                fused = np.round(fused)
            results[i] = fused
    return results


# ---------------------------------------------------------------------------
# Tiling (math parity with reference infer_tile.py:23-91)
# ---------------------------------------------------------------------------

def get_top_left_coordinates(height, width, patch_size):
    n_h = math.ceil(height / patch_size)
    n_w = math.ceil(width / patch_size)
    tops = np.linspace(0, height - patch_size, n_h, dtype=int)
    lefts = np.linspace(0, width - patch_size, n_w, dtype=int)
    return list(product(tops, lefts))


def divide_image_to_patches(img: np.ndarray, patch_size: int) -> np.ndarray:
    assert img.ndim == 3 and img.shape[-1] == 3
    coords = get_top_left_coordinates(img.shape[0], img.shape[1], patch_size)
    return np.stack([img[t:t + patch_size, l:l + patch_size]
                     for t, l in coords]).astype("uint8")


def combine_patches_to_image(patches: np.ndarray, target_height: int,
                             target_width: int) -> np.ndarray:
    """Running-average stitch with an overlap counter channel
    (reference infer_tile.py:59-91)."""
    patch_size = patches.shape[1]
    coords = get_top_left_coordinates(target_height, target_width, patch_size)
    if patches.ndim == 3:
        patches = patches[..., None]
    combined = np.zeros((target_height, target_width, patches.shape[-1] + 1))
    for counter, (top, left) in enumerate(coords):
        sl = np.s_[top:top + patch_size, left:left + patch_size]
        patch = combined[sl][..., :-1]
        overlaps = combined[sl][..., -1:]
        combined[sl][..., :-1] = (patch * overlaps + patches[counter]) / (overlaps + 1)
        combined[sl][..., -1:] = overlaps + 1
    return np.squeeze(combined[..., :-1])


def predict_tiled(predictor: Predictor, img_u8: np.ndarray, patch_size: int,
                  chunk: int = 8, round_patches: bool = True) -> np.ndarray:
    """Tiled prediction: batched patch gather -> chunked device forwards ->
    overlap-averaged stitch.

    round_patches=True reproduces the superpixel-tile path, where each patch
    goes through postprocess (round) before stitching (infer_tile.py:108-110);
    the pixel-tile path stitches raw probabilities (pixel_infer_tile.py:52-57).
    """
    H0, W0 = img_u8.shape[:2]
    patches = divide_image_to_patches(img_u8, patch_size)
    outs = []

    def drain(pred, n, h, w):
        prob = np.asarray(pred)[:n, :h, :w]
        outs.append(np.round(prob) if round_patches else prob)

    # one chunk in flight: chunk i's D2H fetch + rounding overlap chunk
    # i+1's host prep + upload + device compute (same pattern as
    # predict_multiscale_batch above)
    in_flight = None
    for i in range(0, len(patches), chunk):
        block = patches[i:i + chunk].astype(np.float32) / 255.0
        dispatched = predictor.dispatch_padded(block)
        if in_flight is not None:
            drain(*in_flight)
        in_flight = dispatched
    if in_flight is not None:
        drain(*in_flight)
    preds = np.concatenate(outs, axis=0)
    return combine_patches_to_image(preds, H0, W0)
