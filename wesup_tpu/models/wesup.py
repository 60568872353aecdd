"""WESUP model: VGG16 hypercolumn -> superpixel MLP classifier, in pure JAX.

Reference architecture (models/wesup.py:182-304):
  - VGG16 `features` backbone; forward hooks tap all 13 conv outputs
    (pre-ReLU), each passed through a 1x1 "side conv" halving channels, then
    bilinearly upsampled (align_corners=True) to the input size and
    channel-concatenated into a 2112-dim hypercolumn;
  - per-superpixel feature averaging (`sp_maps @ x.t()`);
  - MLP 2112 -> 1024 -> 1024 -> D=32 (ReLU each), classifier Linear(D, C)
    + Softmax.

TPU-native refactor (exact, verified in tests/test_model.py): the side convs,
the fc1 matmul, bilinear resize and segment-mean pooling are all *linear*, so
they commute.  We fold side_conv_i + fc1-block_i into a single per-conv
projection to 1024 applied at the conv's NATIVE resolution, sum projections
within a resolution stage, upsample five 1024-channel stage maps instead of
thirteen 2112-channel ones, and add the accumulated bias once:

    z(p) = sum_i resize_i(F_i @ (W1_i Ws_i)^T)(p) + (b1 + sum_i W1_i bs_i)

`z` (B, H, W, 1024, pre-ReLU) is shared by both heads:
  - superpixel head: segment-mean pool z -> ReLU -> fc2 -> fc3 -> classifier
    (pooling commutes with the linear part of fc1);
  - pixel head (reference WESUPPixelInference, models/wesup.py:307-400):
    ReLU(z) -> fc2 -> fc3 -> classifier per pixel.

This cuts fc1 FLOPs ~8x and never materializes the (H*W, 2112) hypercolumn.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear
from ..ops import segments as seg_ops
from . import vgg

D_DEFAULT = 32


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def _linear_init(key, fan_in, fan_out, dtype=jnp.float32):
    """torch default Linear/Conv init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(k1, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(k2, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_params(key: jax.Array, n_classes: int = 2, D: int = D_DEFAULT,
                fc_width: int = 1024) -> dict:
    """Initialize the full WESUP parameter pytree.

    ``fc_width`` widens/narrows the two hidden fc layers (reference
    hardcodes 1024, models/wesup.py:213-232); the forward reads every
    matmul shape from the tree, so no other code changes."""
    keys = jax.random.split(key, 18)
    params = {"backbone": vgg.init_params(keys[0])}
    side = {}
    for i, c in enumerate(vgg.CONV_CHANNELS):
        side[f"side{i}"] = _linear_init(keys[1 + i], c, c // 2)
    params["side"] = side
    params["fc1"] = _linear_init(keys[14], vgg.FM_CHANNELS_SUM, fc_width)
    params["fc2"] = _linear_init(keys[15], fc_width, fc_width)
    params["fc3"] = _linear_init(keys[16], fc_width, D)
    params["cls"] = _linear_init(keys[17], D, n_classes)
    return params


def convert_torch_state_dict(state_dict) -> dict:
    """Convert a reference WESUP torch ``model_state_dict`` to our pytree.

    Reference key layout (models/base.py:150-166 checkpoint format):
    ``backbone.{i}.weight``, ``side_conv{cum}.weight`` (cum = cumulative
    half-channel offset, models/wesup.py:208-210), ``fc_layers.{0,2,4}.*``,
    ``classifier.0.*``.
    """
    params = {"backbone": vgg.convert_torch_state_dict(state_dict)}

    def lin(prefix):
        w = np.asarray(state_dict[f"{prefix}.weight"], dtype=np.float32)
        b = np.asarray(state_dict[f"{prefix}.bias"], dtype=np.float32)
        if w.ndim == 4:  # 1x1 conv (Co, Ci, 1, 1)
            w = w[:, :, 0, 0]
        return {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}

    side, cum = {}, 0
    for i, c in enumerate(vgg.CONV_CHANNELS):
        side[f"side{i}"] = lin(f"side_conv{cum}")
        cum += c // 2
    params["side"] = side
    params["fc1"] = lin("fc_layers.0")
    params["fc2"] = lin("fc_layers.2")
    params["fc3"] = lin("fc_layers.4")
    params["cls"] = lin("classifier.0")
    return params


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def _fc1_blocks(params) -> List[jnp.ndarray]:
    """Split fc1's (2112, 1024) weight into its 13 per-conv blocks."""
    blocks, off = [], 0
    w1 = params["fc1"]["w"]
    for c in vgg.CONV_CHANNELS:
        blocks.append(w1[off:off + c // 2])
        off += c // 2
    return blocks


def hypercolumn_projection_parts(params: dict, img: jnp.ndarray,
                                 compute_dtype=jnp.float32):
    """Shared pre-ReLU fc1 map WITHOUT bias: ((B, H, W, 1024), bias (1024,)).

    Taps within one resolution stage are concatenated and projected with a
    single fused matmul; the bias (fc1 bias + all side-conv bias
    contributions) is returned separately so heads can add it AFTER pooling
    (mean of a constant is the constant), keeping the big map in bf16.
    """
    B, H, W = img.shape[:3]
    taps = vgg.backbone_features(params["backbone"], img, compute_dtype)
    w1_blocks = _fc1_blocks(params)
    bias = _fused_bias(params, w1_blocks)

    # group taps by resolution stage; one concat + one matmul per stage,
    # W-resize at native height, then ONE fused H-upsample+sum contraction
    from ..ops.resize import fused_upsample_sum, resize_w_only

    stage_maps = []
    for s in range(5):
        stage_taps, proj = _stage_taps_and_proj(params, taps, w1_blocks, s,
                                                compute_dtype)
        z = jnp.einsum("bhwc,cd->bhwd", stage_taps, proj)
        stage_maps.append(resize_w_only(z, W, align_corners=True))
    return fused_upsample_sum(stage_maps, H, align_corners=True), bias


def hypercolumn_projection(params: dict, img: jnp.ndarray,
                           compute_dtype=jnp.float32) -> jnp.ndarray:
    """Biased pre-ReLU fc1 map (B, H, W, 1024) in float32 (test/naive path)."""
    z, bias = hypercolumn_projection_parts(params, img, compute_dtype)
    return z.astype(jnp.float32) + bias


def _mlp_head(params, x: jnp.ndarray):
    """ReLU -> fc2 -> ReLU -> fc3 -> ReLU -> classifier softmax.

    `x` is the pre-ReLU fc1 output (..., 1024).  Returns (probs, features):
    features are the D-dim fc3 outputs used for label propagation
    (reference models/wesup.py:288-292).
    """
    dt = x.dtype
    h = jax.nn.relu(x)
    h = jax.nn.relu(h @ params["fc2"]["w"].astype(dt) + params["fc2"]["b"].astype(dt))
    feats = jax.nn.relu(h @ params["fc3"]["w"].astype(dt) + params["fc3"]["b"].astype(dt))
    logits = feats @ params["cls"]["w"].astype(dt) + params["cls"]["b"].astype(dt)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return probs, feats.astype(jnp.float32)


class SuperpixelForward(NamedTuple):
    sp_pred: jnp.ndarray      # (B, K, C) softmax probabilities
    sp_features: jnp.ndarray  # (B, K, D) propagation features
    pred: jnp.ndarray         # (B, H, W) foreground-probability map


def _stage0_pallas_ok(plan, batch: int) -> bool:
    """Use the stage-0 Pallas pooling kernel?  TPU-only (the CPU mesh and
    virtual-device tests take the XLA one-hot path, whose numerics the
    kernel matches up to fp reassociation — pinned in
    tests/test_cellpool_pallas.py), single-process (pallas_call is not
    SPMD-partitionable across a multi-chip mesh), batch >= 8 (measured
    crossover, PERF_NOTES stage-0 Pallas entry: the kernel wins ~4-8% at
    B=8/16 but loses up to 1.7x at B<=4 where the grid can't fill the
    pipeline), and the plan's canvas must be 8-row divisible.
    ``WESUP_STAGE0_PALLAS=0`` forces the XLA path for A/B measurement."""
    import os

    if os.environ.get("WESUP_STAGE0_PALLAS", "1") == "0":
        return False
    if plan is None or batch < 8 or jax.default_backend() != "tpu":
        return False
    if len(jax.devices()) != 1:
        return False
    from ..ops import cellpool_pallas

    return cellpool_pallas.supports(plan)


def _stage_taps_and_proj(params, taps, w1_blocks, s, compute_dtype):
    """Concatenated taps of resolution stage ``s`` and the fused
    (side conv x fc1-block) projection for them."""
    idxs = [i for i, st in enumerate(vgg.CONV_STAGE) if st == s]
    stage_taps = jnp.concatenate([taps[i] for i in idxs], axis=-1)
    proj = jnp.concatenate([
        (params["side"][f"side{i}"]["w"].astype(jnp.float32)
         @ w1_blocks[i].astype(jnp.float32)) for i in idxs
    ], axis=0).astype(compute_dtype)  # (sum C_i, 1024)
    return stage_taps, proj


def _fused_bias(params, w1_blocks):
    """fc1 bias + every side-conv bias pushed through its fc1 block."""
    bias = params["fc1"]["b"].astype(jnp.float32)
    for i in range(len(vgg.CONV_CHANNELS)):
        side = params["side"][f"side{i}"]
        bias = bias + (side["b"].astype(jnp.float32)
                       @ w1_blocks[i].astype(jnp.float32))
    return bias


def forward_superpixel(params: dict, img: jnp.ndarray, seg: jnp.ndarray,
                       K: int, valid: jnp.ndarray | None = None,
                       compute_dtype=jnp.float32,
                       pooling: str = "adjoint",
                       plan=None) -> SuperpixelForward:
    """Superpixel-wise forward (reference WESUP.forward, models/wesup.py:263-304).

    Args:
        img: (B, H, W, 3) in [0, 1]
        seg: (B, H, W) int32 superpixel assignments in [0, K)
        valid: (B, H, W) bool canvas validity
        pooling: 'adjoint' (default) pools every stage at its NATIVE
            resolution through adjoint-resized assignment weights — exact up
            to fp reassociation, and the (B, H, W, 1024) full-resolution map
            never exists (~4x less HBM traffic).  'fullres' is the round-1
            upsample-then-pool formulation, kept for ablation.
        plan: optional ``SlicPlan`` matching ``seg`` (i.e. seg came from
            ops/slic.py at this shape).  When given, the small-C one-hot
            consumers — counts and prediction painting — use the exact
            cell-grid forms (ops/cellgrid.py) instead of re-reading the
            (B, H, W, K) one-hot, and the unmasked ``oh_raw`` copy is never
            built.  ``None`` keeps the general path for arbitrary seg.
    """
    if pooling == "fullres":
        return forward_superpixel_fullres(params, img, seg, K, valid,
                                          compute_dtype)
    B, H, W = img.shape[:3]

    taps = vgg.backbone_features(params["backbone"], img, compute_dtype)
    w1_blocks = _fc1_blocks(params)
    bias = _fused_bias(params, w1_blocks)

    if plan is not None and plan.n_clusters != K:
        raise ValueError(f"plan has {plan.n_clusters} clusters, K={K}")

    use_local = pooling == "local"
    if use_local and plan is None:
        raise ValueError("pooling='local' requires a SlicPlan")
    use_pallas0 = use_local and _stage0_pallas_ok(plan, B)
    # the downsampled-stage kernel shares the gate; its own env override
    # (WESUP_STAGE_PALLAS=0/1) allows independent A/B measurement
    _env_s = os.environ.get("WESUP_STAGE_PALLAS")
    use_pallas_stage = (use_pallas0 if _env_s is None
                        else use_local and _env_s == "1")

    # one-hot assignment for the big-C adjoint pooling (gathers profiled
    # 23 ms/step; one-hot matmuls <1 ms).  With the stage-0 Pallas kernel
    # active it is never built at all ('local' mode's other consumers are
    # already cell-grid forms).
    if plan is None:
        # raw copy kept for painting, validity-masked for pooling
        oh_raw = (seg[..., None] == jnp.arange(K, dtype=seg.dtype)
                  ).astype(compute_dtype)                   # (B, H, W, K)
        if valid is not None:
            oh = oh_raw * valid[..., None].astype(compute_dtype)
        else:
            oh = oh_raw
        counts = oh.sum(axis=(1, 2)).astype(jnp.float32)    # (B, K)
    else:
        from ..ops import cellgrid

        if not use_pallas0:
            cmp = seg[..., None] == jnp.arange(K, dtype=seg.dtype)
            if valid is not None:
                cmp = cmp & valid[..., None]
            oh = cmp.astype(compute_dtype)
        if valid is None:
            counts = jax.vmap(
                lambda s: cellgrid.cell_counts(plan, s))(seg)
        else:
            counts = jax.vmap(
                lambda s, v: cellgrid.cell_counts(plan, s, v))(seg, valid)

    # Exact adjoint-pooling identity: for the separable bilinear upsample
    # R = A_h (x) A_w,  sum_{p in k} resize(z_s)(p) = <M_s[..., k], z_s>
    # with M_s = A_h^T OH A_w — so every stage pools AT NATIVE RESOLUTION
    # (two banded adjoint contractions on the one-hot + a (Q_s, K)x(Q_s, C)
    # matmul), and pooling commutes with the stage projection, so the
    # (K, C_s) sums are projected AFTER pooling (the stage-1 trick of
    # round 1, generalized to all five stages).
    #
    # The H-adjoints of ALL downsampled stages are stacked column-wise into
    # one block matrix so the (B, H, W, K) one-hot — the biggest tensor in
    # the step (~1.1 GB bf16 at GlaS-0.5x B=8) — is read ONCE instead of
    # once per stage (profiled ~10 ms/step of pure HBM reads).
    from ..ops.resize import _interp_matrix

    stage_parts = [
        _stage_taps_and_proj(params, taps, w1_blocks, s, compute_dtype)
        for s in range(5)
    ]
    down = [s for s in range(5)
            if tuple(stage_parts[s][0].shape[1:3]) != (H, W)]
    t_cat = None
    e9 = None
    # structural (stage -> column slice) pairing into t_cat, so a reorder or
    # per-stage skip can never silently slice the wrong adjoint block
    stage_Hs = [stage_parts[s][0].shape[1] for s in down]
    t_slices = dict(zip(down, zip(np.cumsum([0] + stage_Hs[:-1]), stage_Hs)))
    if down and not use_local:
        A_cat = np.concatenate(
            [_interp_matrix(Hs, H, True) for Hs in stage_Hs],
            axis=1)                                      # (H, sum Hs)
        t_cat = jnp.einsum("hu,bhwk->buwk",
                           jnp.asarray(A_cat, compute_dtype), oh)
    elif down:
        # 'local' mode: the downsampled stages' adjoint weights come from
        # the (B, H, W, 9) offset masks via banded window constants —
        # neither t_cat nor any K-wide full-res read besides stage 0's
        from ..ops import cellgrid

        e9 = cellgrid.offset_masks(plan, seg, valid, compute_dtype)

    pooled = None
    for s in range(5):
        stage_taps, proj = stage_parts[s]
        Hs, Ws = stage_taps.shape[1:3]
        if (Hs, Ws) == (H, W):
            if use_pallas0:
                # fused cell-window kernel: no one-hot, ~6x fewer FLOPs
                # (ops/cellpool_pallas.py); backward is the same one-hot
                # matmul the XLA path takes
                from ..ops import cellpool_pallas

                seg_m = (seg if valid is None
                         else jnp.where(valid, seg, -1))
                sums = cellpool_pallas.cell_pool0(plan, seg_m, stage_taps)
            else:
                sums = jnp.einsum("buvk,buvc->bkc", oh, stage_taps,
                                  preferred_element_type=jnp.float32)
        elif use_local:
            from ..ops import cellgrid

            spp = cellgrid.make_stage_pool_plan(plan, Hs, Ws, True)
            from ..ops.cellpool_pallas import supports_stage

            if use_pallas_stage and supports_stage(plan, spp):
                # weighted cell-window kernel: pools straight from the
                # compact (B,Hs,Ih,Ws,Jw) window weights, never expanding
                # to (B,Hs,Kh,Ws,Kw) (ops/cellpool_pallas.py)
                from ..ops import cellpool_pallas

                sums = cellpool_pallas.cell_pool_stage(
                    plan, spp, e9, stage_taps)
            else:
                Md = cellgrid.stage_adjoint_weights(spp, e9)
                sums = jnp.einsum("bpyqx,bpqc->byxc", Md, stage_taps,
                                  preferred_element_type=jnp.float32
                                  ).reshape(B, K, stage_taps.shape[-1])
        else:
            A_w = jnp.asarray(_interp_matrix(Ws, W, True), compute_dtype)
            off, nH = t_slices[s]
            M = jnp.einsum("wv,buwk->buvk", A_w, t_cat[:, off:off + nH])
            sums = jnp.einsum("buvk,buvc->bkc", M, stage_taps,
                              preferred_element_type=jnp.float32)
        contrib = jnp.einsum("bkc,cd->bkd", sums.astype(compute_dtype), proj,
                             preferred_element_type=jnp.float32)
        pooled = contrib if pooled is None else pooled + contrib

    pooled = pooled / jnp.maximum(counts[..., None], 1.0)   # (B, K, 1024)
    sp_pred, sp_feats = _mlp_head(params, pooled + bias)

    if plan is None:
        fg = jnp.einsum(
            "bhwk,bk->bhw", oh_raw,
            sp_pred[..., 1].astype(compute_dtype)).astype(jnp.float32)
    else:
        from ..ops import cellgrid

        vals = sp_pred[..., 1].astype(compute_dtype)
        fg = jax.vmap(lambda s, v: cellgrid.cell_paint(plan, s, v))(
            seg, vals).astype(jnp.float32)
    return SuperpixelForward(sp_pred, sp_feats, fg)


def forward_superpixel_fullres(params: dict, img: jnp.ndarray,
                               seg: jnp.ndarray, K: int,
                               valid: jnp.ndarray | None = None,
                               compute_dtype=jnp.float32) -> SuperpixelForward:
    """Round-1 formulation (ablation baseline): project per stage at native
    resolution, W-resize, ONE fused H-upsample+sum contraction into the
    full-resolution (B, H, W, 1024) map, then pool (stage 1 pool-then-
    project).  Exact; ~4x more HBM traffic than the adjoint default."""
    B, H, W = img.shape[:3]
    if valid is None:
        valid = jnp.ones((B, H, W), bool)

    taps = vgg.backbone_features(params["backbone"], img, compute_dtype)
    w1_blocks = _fc1_blocks(params)
    bias = _fused_bias(params, w1_blocks)

    # stages 2-5 need upsampling: project at native resolution, W-resize,
    # then ONE fused H-upsample+sum contraction (exact)
    from ..ops.resize import fused_upsample_sum, resize_w_only

    stage_maps = []
    for s in range(1, 5):
        stage_taps, proj = _stage_taps_and_proj(params, taps, w1_blocks, s,
                                                compute_dtype)
        z = jnp.einsum("bhwc,cd->bhwd", stage_taps, proj)
        stage_maps.append(resize_w_only(z, W, align_corners=True))
    z_rest = fused_upsample_sum(stage_maps, H, align_corners=True)

    # stage 1 sits at full resolution already: pooling commutes with its
    # projection, so pool the 128-ch taps FIRST and project the (K, 128)
    # result — the (B, H, W, 1024) stage-1 map never exists (saves ~2 GB of
    # HBM writes per GlaS-0.5x B=8 step)
    taps0, proj0 = _stage_taps_and_proj(params, taps, w1_blocks, 0,
                                        compute_dtype)

    def pool_one(taps0_i, z_rest_i, seg_i, valid_i):
        oh = seg_ops.one_hot_assignment(seg_i, K, valid_i, dtype=compute_dtype)
        counts = oh.sum(axis=0)
        sum0 = jnp.einsum("pk,pc->kc", oh, taps0_i.reshape(-1, taps0_i.shape[-1]),
                          preferred_element_type=jnp.float32)
        sum_rest = jnp.einsum("pk,pc->kc", oh,
                              z_rest_i.reshape(-1, z_rest_i.shape[-1]),
                              preferred_element_type=jnp.float32)
        total = sum0.astype(compute_dtype) @ proj0 + sum_rest.astype(jnp.float32)
        return total.astype(jnp.float32) / jnp.maximum(counts[:, None], 1.0)

    pooled = jax.vmap(pool_one)(taps0, z_rest, seg, valid)  # (B, K, 1024)

    sp_pred, sp_feats = _mlp_head(params, pooled + bias)

    # paint via a one-hot matmul instead of a gather: TPU gathers of
    # (H, W)-indexed tables profiled at 23 ms/step vs <1 ms for the matmul
    def paint_one(seg_i, vals):
        oh = seg_ops.one_hot_assignment(seg_i, K, None, dtype=compute_dtype)
        return (oh @ vals.astype(compute_dtype)).reshape(H, W)

    fg = jax.vmap(paint_one)(seg, sp_pred[..., 1]).astype(jnp.float32)
    return SuperpixelForward(sp_pred, sp_feats, fg)


def forward_pixel(params: dict, img: jnp.ndarray,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-wise forward (reference WESUPPixelInference.forward,
    models/wesup.py:382-400): classify every pixel's hypercolumn.

    Returns (B, H, W, C) softmax probabilities.

    This monolithic formulation is the measured optimum (~56% MFU, fc2 at
    80% of peak): a scanned row-block variant and a split of stage 0 out of
    the fused upsample buffer were both measured SLOWER (PERF_NOTES items
    39-41 — XLA's buffer-build/contraction fusions beat hand-restructuring).
    """
    z, bias = hypercolumn_projection_parts(params, img, compute_dtype)
    probs, _ = _mlp_head(params, z + bias.astype(z.dtype))
    return probs


# ---------------------------------------------------------------------------
# Reference-faithful naive path (for equivalence tests only)
# ---------------------------------------------------------------------------

def naive_hypercolumn(params: dict, img: jnp.ndarray) -> jnp.ndarray:
    """Materialize the (B, H, W, 2112) hypercolumn exactly as the reference
    hooks do: side conv then bilinear upsample then concat."""
    B, H, W = img.shape[:3]
    taps = vgg.backbone_features(params["backbone"], img, jnp.float32)
    cols = []
    for i, tap in enumerate(taps):
        side = params["side"][f"side{i}"]
        z = jnp.einsum("bhwc,cd->bhwd", tap, side["w"]) + side["b"]
        cols.append(resize_bilinear(z, (H, W), align_corners=True))
    return jnp.concatenate(cols, axis=-1)


def naive_forward_superpixel(params: dict, img: jnp.ndarray, seg: jnp.ndarray,
                             K: int, valid: jnp.ndarray | None = None):
    """Pool the materialized 2112-d hypercolumn, then fc1 (reference order)."""
    B, H, W = img.shape[:3]
    hc = naive_hypercolumn(params, img)
    if valid is None:
        valid = jnp.ones((B, H, W), bool)

    def pool_one(h_i, seg_i, valid_i):
        oh = seg_ops.one_hot_assignment(seg_i, K, valid_i)
        counts = oh.sum(axis=0)
        return seg_ops.segment_mean(h_i.reshape(-1, h_i.shape[-1]), oh, counts)

    pooled = jax.vmap(pool_one)(hc, seg, valid)
    x = pooled @ params["fc1"]["w"] + params["fc1"]["b"]
    sp_pred, sp_feats = _mlp_head(params, x)
    fg = jax.vmap(seg_ops.paint)(seg, sp_pred[..., 1])
    return SuperpixelForward(sp_pred, sp_feats, fg)
