"""Jitted train/eval step builders: the whole per-iteration pipeline on device.

Reference hot loop (models/base.py:184-211 + models/wesup.py:457-531) per
image: host SLIC -> device forward -> loss -> backward -> SGD step, with a
GPU->CPU->GPU round trip for SLIC and Python loops for superpixel handling.
Here ONE compiled XLA program per batch does: augmentation -> point
rasterization -> SLIC -> superpixel stats -> hypercolumn forward -> loss ->
backward -> optimizer update -> train metrics.  Zero host round trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import WESUPConfig
from ..ops import augment as aug
from ..ops.slic import make_plan, n_clusters, slic
from ..ops.segments import superpixel_stats
from ..ops import train_resize
from ..utils.metrics import device_accuracy, device_dice
from . import wesup
from .objectives import wesup_loss


# ---------------------------------------------------------------------------
# Optimizer (parity with torch.optim.SGD(lr, momentum, weight_decay) +
# requires_grad filtering, reference models/wesup.py:445-455)
# ---------------------------------------------------------------------------

def make_optimizer(config: WESUPConfig):
    # Divergence (documented in README): the reference's freeze_backbone
    # KWARG is dead — its trainer reads the class default, which is False
    # (models/wesup.py:427-429), so passing freeze_backbone=True there does
    # nothing.  Here the flag is functional: backbone updates are zeroed.
    tx = optax.chain(
        optax.add_decayed_weights(config.weight_decay),
        optax.trace(decay=config.momentum),
        optax.scale(-config.lr),
    )
    if config.freeze_backbone:
        def label(params):
            return {k: ("frozen" if k == "backbone" else "train")
                    for k in params}

        def relabel(tree, lab):
            return jax.tree.map(lambda _: lab, tree)

        def labels(params):
            return {k: relabel(v, "frozen" if k == "backbone" else "train")
                    for k, v in params.items()}

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels)
    return tx


# ---------------------------------------------------------------------------
# Per-sample device preprocessing
# ---------------------------------------------------------------------------

def _rasterize_points(points, point_valid, hw, n_classes):
    """Scatter (P, 3) xy-class points into a (H, W, C) one-hot mask.

    Equivalent to cv2.circle(radius=0) rasterization in the reference
    (utils/data.py:360-362).  Out-of-bounds or padded points are dropped, as
    albumentations drops keypoints leaving the frame.
    """
    H, W = hw
    xs = points[:, 0]
    ys = points[:, 1]
    cs = jnp.clip(points[:, 2], 0, n_classes - 1)
    ok = (point_valid & (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H))
    # route dropped points to (0, 0) with value 0 so they are no-ops
    ys = jnp.where(ok, ys, 0)
    xs = jnp.where(ok, xs, 0)
    mask = jnp.zeros((H, W, n_classes), jnp.float32)
    return mask.at[ys, xs, cs].max(ok.astype(jnp.float32))


class Preprocessed(NamedTuple):
    image: jnp.ndarray       # (H, W, 3) float
    valid: jnp.ndarray       # (H, W) bool
    target: jnp.ndarray      # (H, W) int32 class idx (-1 where absent)
    seg: jnp.ndarray         # (H, W) int32 superpixel ids
    sup_mask: jnp.ndarray    # (H, W, C) supervision one-hot (zeros if none)


def _preprocess_sample(rng, image_u8, valid, pixel_mask, points, point_valid,
                       use_mask_as_points, *, config: WESUPConfig,
                       train: bool, point_mode: bool):
    """Augment + rasterize + SLIC for one sample (vmapped over the batch)."""
    H, W = image_u8.shape[:2]
    C = config.n_classes
    img = image_u8.astype(jnp.float32) / 255.0

    pts_xy = points[:, :2].astype(jnp.float32)

    if train:
        k_app, k_aff, k_el = jax.random.split(rng, 3)
        if point_mode:
            app_cfg = aug.AppearanceConfig()  # albumentations defaults
            pos_cfg = aug.PositionConfig(ssr_p=1.0)
        else:
            # SegmentationDataset path: milder appearance, SSR p=0.8, elastic
            app_cfg = aug.AppearanceConfig(hue_shift_limit=10,
                                           sat_shift_limit=10,
                                           val_shift_limit=10,
                                           brightness_limit=0.1,
                                           contrast_limit=0.1)
            pos_cfg = aug.PositionConfig(ssr_p=0.8)
        img = aug.random_appearance(k_app, img, app_cfg)
        if not point_mode and config.elastic_p > 0:
            do_el = jax.random.bernoulli(jax.random.fold_in(k_el, 0),
                                         config.elastic_p)
            el_img, el_mask = aug.random_elastic(k_el, img,
                                                 pixel_mask.astype(jnp.float32))
            img = jnp.where(do_el, el_img, img)
            pixel_mask = jnp.where(do_el, el_mask.astype(jnp.int32), pixel_mask)

        A = aug.random_affine(k_aff, (H, W), pos_cfg)
        warp_fn = (aug.warp_exact if config.warp_method == "exact"
                   else aug.warp)
        img = warp_fn(img, A, order=1)
        # mask and valid share the order-0 banded weights (one warp, two
        # channels, per-channel fill) — the weight tensors are the cost
        aux = jnp.stack([pixel_mask.astype(jnp.float32),
                         valid.astype(jnp.float32)], axis=-1)
        aux = warp_fn(aux, A, order=0, fill=jnp.array([-1.0, 0.0]))
        pixel_mask = aux[..., 0].astype(jnp.int32)
        valid = aux[..., 1] > 0.5
        pts_xy = aug.transform_points(pts_xy, A)

    pts_int = jnp.concatenate(
        [jnp.floor(pts_xy + 0.5).astype(jnp.int32), points[:, 2:3]], axis=-1)
    point_mask = _rasterize_points(pts_int, point_valid, (H, W), C)

    pixel_onehot = ((pixel_mask[..., None] == jnp.arange(C)) &
                    (pixel_mask[..., None] >= 0)).astype(jnp.float32)

    # supervision selection (reference preprocess, models/wesup.py:480-485):
    # point mask if present, else pixel mask, else nothing
    point_sup = jnp.where(use_mask_as_points, pixel_onehot, point_mask)
    has_points = point_valid.any() | use_mask_as_points
    has_pixel = (pixel_mask >= 0).any()
    sup = jnp.where(has_points, point_sup,
                    jnp.where(has_pixel, pixel_onehot, 0.0))
    # annotations only count on valid canvas pixels
    sup = sup * valid[..., None].astype(jnp.float32)

    img = jnp.clip(img, 0.0, 1.0)
    seg = slic(img, valid, sp_area=config.sp_area,
               compactness=config.sp_compactness, n_iters=config.slic_iters,
               update_stride=config.slic_update_stride)
    return Preprocessed(img, valid, pixel_mask, seg, sup)


# ---------------------------------------------------------------------------
# Step builders
# ---------------------------------------------------------------------------

def _forward_and_loss(params, prep: Preprocessed, K, config: WESUPConfig,
                      sample_valid, plan=None):
    compute_dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                     else jnp.float32)
    out = wesup.forward_superpixel(params, prep.image, prep.seg, K,
                                   prep.valid, compute_dtype,
                                   pooling=config.pooling, plan=plan)

    def per_sample(sp_pred, sp_feats, seg_i, sup_i, valid_i):
        stats = superpixel_stats(seg_i, K, sup_i, valid_i, plan=plan)
        return wesup_loss(
            sp_pred, sp_feats, stats.labels, stats.labeled, stats.real,
            # reference never applies its class_weights config (its trainer
            # binds partial(_cross_entropy) weight-free, models/wesup.py:434)
            class_weights=(config.class_weights
                           if config.apply_class_weights else None),
            enable_propagation=config.enable_propagation,
            propagate_threshold=config.propagate_threshold,
            propagate_weight=config.propagate_weight,
            epsilon=config.epsilon)

    losses = jax.vmap(per_sample)(out.sp_pred, out.sp_features, prep.seg,
                                  prep.sup_mask, prep.valid)
    w = sample_valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    loss = (losses.loss * w).sum() / n
    return loss, (out, losses)


TRAIN_METRIC_KEYS = ("loss", "accuracy", "dice", "labeled_sp_ratio",
                     "propagated_labels", "propagate_loss")
EVAL_METRIC_KEYS = ("accuracy", "dice")


def _extent_valid(content_hw, H, W):
    """(B, H, W) top-left rectangle masks from (B, 2) content extents."""
    hs, ws = content_hw[:, 0], content_hw[:, 1]
    return ((jnp.arange(H)[None, :, None] < hs[:, None, None]) &
            (jnp.arange(W)[None, None, :] < ws[:, None, None]))


def _batch_valid_and_mask(batch, H, W):
    """(valid, pixel_mask) from a batch in either wire format.

    The trainer's H2D path sends per-sample (h, w) content extents instead
    of the (B, H, W) bool mask (the mask is always a top-left rectangle —
    loader.place_on_canvas) and pixel_mask as int8: the axon tunnel is
    bandwidth-bound at ~90 MB/s, so halving wire bytes halves transfer wall
    (PERF_NOTES round-4 epoch entry).  Direct callers (bench, graft entry,
    tests) may still pass the explicit mask.
    """
    if "content_hw" in batch:
        valid = _extent_valid(batch["content_hw"], H, W)
    else:
        valid = batch["valid"]
    return valid, batch["pixel_mask"].astype(jnp.int32)


def _batch_inputs(batch, cache, H, W):
    """(image_u8, valid, pixel_mask) in any wire format.

    With a device-resize cache and metadata (ops/train_resize.py) the
    uint8 canvas image and int mask materialize HERE, bit-exactly equal to
    what the host path would have shipped; otherwise they come off the
    wire as before."""
    if cache is not None and "img_idx" in batch:
        image, pixel_mask = train_resize.apply_resize(cache, batch)
        return image, _extent_valid(batch["content_hw"], H, W), pixel_mask
    valid, pixel_mask = _batch_valid_and_mask(batch, H, W)
    return batch["image"], valid, pixel_mask


def _batch_rng_key(rng, batch, phase_const: int):
    """Resolve the per-batch PRNG key for a step.

    The trainer's wire format carries ``rng_idx`` — (B, 2) int32 rows all
    equal to (epoch, batch_idx) so the leaf shards over 'data' like every
    other batch leaf — and passes its BASE key as ``rng``; the derivation
    chain (fold epoch, fold phase, fold batch) runs INSIDE the jitted step.
    Host-side derivation cost ~3 tiny device programs per batch: 33 extra
    tunnel dispatches per GlaS-85 epoch serializing with the 11 real steps
    (PERF_NOTES round-4 epoch entry).  The values are bit-identical to the
    host chain (threefry fold_in is deterministic), so histories are
    unchanged.  Direct callers (bench, tests, scripts) pass a fully derived
    key and no ``rng_idx``; then ``rng`` is used as-is.
    """
    if "rng_idx" not in batch:
        return rng
    key = jax.random.fold_in(rng, batch["rng_idx"][0, 0])
    key = jax.random.fold_in(key, phase_const)
    return jax.random.fold_in(key, batch["rng_idx"][0, 1])


def init_metric_acc(keys=TRAIN_METRIC_KEYS):
    """On-device metric accumulator: per-metric (sum, count) + NaN flag.

    The axon TPU tunnel costs ~30 ms per device->host transfer; fetching
    per-step metrics would triple the step time, so sums accumulate on device
    and are read once per phase.  history.csv records epoch MEANS either way
    (utils/history.py:46-64), so this is observationally equivalent to the
    reference's per-image tracking; the NaN-loss abort fires at phase end
    instead of mid-epoch.
    """
    import jax.numpy as jnp

    return {
        "sums": {k: jnp.zeros(()) for k in keys},
        "count": jnp.zeros(()),
        "nan": jnp.zeros((), bool),
    }


def _accumulate(acc, per_image: dict, sample_valid):
    w = sample_valid.astype(jnp.float32)
    sums = dict(acc["sums"])
    nan = acc["nan"]
    for k, v in per_image.items():
        v = v.astype(jnp.float32)
        sums[k] = sums[k] + jnp.sum(v * w)
        nan = nan | jnp.any(jnp.isnan(v) & (w > 0))
    return {"sums": sums, "count": acc["count"] + w.sum(), "nan": nan}


def make_train_step(config: WESUPConfig, canvas_hw, *, point_mode: bool,
                    tx) -> callable:
    """Build the jitted train step for a given canvas shape.

    Signature: (params, opt_state, acc, batch, rng) ->
               (params, opt_state, acc) — nothing is transferred per step.
    """
    H, W = canvas_hw
    K = n_clusters(H, W, config.sp_area)
    plan = make_plan(H, W, config.sp_area)

    pre = functools.partial(_preprocess_sample, config=config, train=True,
                            point_mode=point_mode)

    def step(params, opt_state, acc, batch, rng, cache=None):
        B = batch["sample_valid"].shape[0]
        rngs = jax.random.split(_batch_rng_key(rng, batch, 0), B)
        image, valid, pixel_mask = _batch_inputs(batch, cache, H, W)
        prep = jax.vmap(pre)(rngs, image, valid,
                             pixel_mask, batch["points"],
                             batch["point_valid"], batch["use_mask_as_points"])

        (loss, (out, losses)), grads = jax.value_and_grad(
            _forward_and_loss, has_aux=True)(params, prep, K, config,
                                             batch["sample_valid"], plan)

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        pred = jnp.round(out.pred).astype(jnp.int32)
        target = prep.target
        mvalid = prep.valid & (target >= 0)
        metrics = {
            "loss": losses.loss,
            "accuracy": device_accuracy(pred, target, mvalid),
            "dice": device_dice(pred, target, mvalid),
            "labeled_sp_ratio": losses.labeled_sp_ratio,
            "propagated_labels": losses.propagated_labels,
            "propagate_loss": losses.propagate_loss,
        }
        acc = _accumulate(acc, metrics, batch["sample_valid"])
        return params, opt_state, acc

    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_predict_step(config: WESUPConfig, canvas_hw, mode: str) -> callable:
    """Pure prediction step for inference CLIs.

    mode='superpixel': SLIC + superpixel classification -> (B, H, W) fg prob
    (reference WESUP.forward).  mode='pixel': per-pixel hypercolumn
    classification -> (B, H, W) fg prob (reference WESUPPixelInference).
    """
    H, W = canvas_hw
    compute_dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                     else jnp.float32)

    # accepts uint8 (0..255, the dataset convention) or float (0..1, the
    # inference CLIs' post-interpolation images; the reference keeps floats
    # after F.interpolate, infer.py:74, so no re-quantization here)
    def to_float(image):
        if image.dtype == jnp.uint8:
            return image.astype(jnp.float32) / 255.0
        return image.astype(jnp.float32)

    if mode == "superpixel":
        K = n_clusters(H, W, config.sp_area)
        plan = make_plan(H, W, config.sp_area)

        def step(params, image, valid):
            img = to_float(image)
            seg = jax.vmap(lambda im, v: slic(
                im, v, sp_area=config.sp_area,
                compactness=config.sp_compactness,
                n_iters=config.slic_iters,
                update_stride=config.slic_update_stride))(img, valid)
            out = wesup.forward_superpixel(params, img, seg, K, valid,
                                           compute_dtype,
                                           pooling=config.pooling, plan=plan)
            return out.pred
    elif mode == "pixel":
        def step(params, image, valid):
            probs = wesup.forward_pixel(params, to_float(image), compute_dtype)
            return probs[..., 1]
    else:
        raise ValueError(f"unknown predict mode: {mode}")

    return jax.jit(step)


def make_scaled_predict_step(config: WESUPConfig, content_hw, target_hw,
                             canvas_hw, mode: str) -> callable:
    """One fused multi-scale-inference stage, fully on device.

    Takes images at ORIGINAL resolution (placed on ``canvas_hw``), performs
    the per-scale resize on device (the reference does this with
    F.interpolate on host tensors, infer.py:74; a single-core host would
    bottleneck the chip ~10x), runs the model at the scaled resolution, and
    resizes the result BACK to the original resolution — superpixel mode
    returns per-scale ROUNDED predictions nearest-upsampled (infer.py:24-33),
    pixel mode returns probabilities bilinearly upsampled with
    align_corners=True (pixel_infer.py:47-52).
    """
    from ..ops.resize import resize_bilinear, resize_nearest

    Ho, Wo = int(content_hw[0]), int(content_hw[1])
    th, tw = int(target_hw[0]), int(target_hw[1])
    Hc, Wc = int(canvas_hw[0]), int(canvas_hw[1])
    # scaled content padded up to a 32-aligned compute canvas
    Hs = -(-th // 32) * 32
    Ws = -(-tw // 32) * 32
    compute_dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                     else jnp.float32)
    sp_mode = mode == "superpixel"
    align = not sp_mode  # reference: bilinear default down, AC=True for pixel

    def step(params, image):
        img = image[:, :Ho, :Wo].astype(jnp.float32)
        if image.dtype == jnp.uint8:
            img = img / 255.0
        scaled = resize_bilinear(img, (th, tw), align_corners=align)
        scaled = jnp.pad(scaled, ((0, 0), (0, Hs - th), (0, Ws - tw), (0, 0)),
                         mode="edge")
        B = scaled.shape[0]
        valid = jnp.zeros((B, Hs, Ws), bool).at[:, :th, :tw].set(True)

        if sp_mode:
            K = n_clusters(Hs, Ws, config.sp_area)
            plan = make_plan(Hs, Ws, config.sp_area)
            seg = jax.vmap(lambda im, v: slic(
                im, v, sp_area=config.sp_area,
                compactness=config.sp_compactness,
                n_iters=config.slic_iters,
                update_stride=config.slic_update_stride))(scaled, valid)
            out = wesup.forward_superpixel(params, scaled, seg, K, valid,
                                           compute_dtype,
                                           pooling=config.pooling, plan=plan)
            pred = jnp.round(out.pred[:, :th, :tw])
            # rounded 0/1 predictions travel back through the tunnel as
            # uint8 (4x less transfer than f32)
            up = resize_nearest(pred[..., None], (Ho, Wo))[..., 0]
            return up.astype(jnp.uint8)
        probs = wesup.forward_pixel(params, scaled, compute_dtype)
        prob = probs[:, :th, :tw, 1]
        return resize_bilinear(prob[..., None], (Ho, Wo),
                               align_corners=True)[..., 0]

    return jax.jit(step)


def make_eval_step(config: WESUPConfig, canvas_hw) -> callable:
    """Validation/inference step: no augmentation, no gradients."""
    H, W = canvas_hw
    K = n_clusters(H, W, config.sp_area)
    plan = make_plan(H, W, config.sp_area)
    pre = functools.partial(_preprocess_sample, config=config, train=False,
                            point_mode=False)

    def step(params, acc, batch, rng, cache=None):
        B = batch["sample_valid"].shape[0]
        rngs = jax.random.split(_batch_rng_key(rng, batch, 1), B)
        image, valid, pixel_mask = _batch_inputs(batch, cache, H, W)
        prep = jax.vmap(pre)(rngs, image, valid,
                             pixel_mask, batch["points"],
                             batch["point_valid"], batch["use_mask_as_points"])
        compute_dtype = (jnp.bfloat16 if config.compute_dtype == "bfloat16"
                         else jnp.float32)
        out = wesup.forward_superpixel(params, prep.image, prep.seg, K,
                                       prep.valid, compute_dtype,
                                       pooling=config.pooling, plan=plan)
        pred = jnp.round(out.pred).astype(jnp.int32)
        target = prep.target
        mvalid = prep.valid & (target >= 0)
        metrics = {
            "accuracy": device_accuracy(pred, target, mvalid),
            "dice": device_dice(pred, target, mvalid),
        }
        acc = _accumulate(acc, metrics, batch["sample_valid"])
        return out.pred, acc

    return jax.jit(step, donate_argnums=(1,))
