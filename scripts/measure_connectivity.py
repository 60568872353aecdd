"""Quantify the missing SLIC connectivity pass (VERDICT r4 #6).

The reference runs skimage SLIC with ``enforce_connectivity=True``
(/root/reference/models/wesup.py:471-476): after k-means, connected
components smaller than ``min_size_factor * (H*W/K)`` are merged into an
adjacent segment.  Our on-device SLIC (ops/slic.py) has no such pass, and
the superpixel-oracle acceptance probe measures majority-vote accuracy —
which cannot see fragmentation: a superpixel split into disconnected
islands changes the PROPAGATION GRAPH (feature means over non-contiguous
regions) without moving the oracle.

This script measures where that could bite, on hard-protocol images:

1. islands-per-superpixel statistics of our production seg (4-connected
   components per label, cropped to per-label bounding boxes);
2. an A/B of the actual model outputs: forward_superpixel with our seg vs
   the same seg after a host connectivity-enforcement pass (non-primary
   islands merged into the dominant adjacent label — the static-K
   analogue of skimage's merge; islands large enough that skimage would
   have PROMOTED them to new segments are counted separately), comparing
   painted predictions and per-image Dice against ground truth.

Usage:
    python scripts/measure_connectivity.py [--n 16] [--ckpt RECORD_DIR]
        [--platform axon|cpu] [--out artifacts/connectivity_r5.json]

Without --ckpt it uses a fresh seeded init (prediction DELTAS between the
two segs are still meaningful; absolute Dice is not and is omitted).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")


def island_stats(seg: np.ndarray, sp_area: int):
    """Per-label 4-connected component stats for one (H, W) int seg."""
    from scipy import ndimage

    H, W = seg.shape
    labels = np.unique(seg)
    min_size = 0.5 * sp_area  # skimage min_size_factor=0.5 * (H*W/K)
    n_frag = n_total = 0
    stray_px = 0
    big_islands = 0
    comps_per_label = []
    slices = ndimage.find_objects(seg + 1)
    s4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    for lab in labels:
        sl = slices[lab]
        if sl is None:
            continue
        m = seg[sl] == lab
        cc, n = ndimage.label(m, structure=s4)
        n_total += 1
        comps_per_label.append(n)
        if n > 1:
            n_frag += 1
            sizes = np.bincount(cc.ravel())[1:]
            order = np.argsort(sizes)[::-1]
            stray_px += int(sizes[order[1:]].sum())
            big_islands += int((sizes[order[1:]] >= min_size).sum())
    return {
        "n_superpixels": n_total,
        "fragmented": n_frag,
        "fragmented_pct": round(100.0 * n_frag / max(n_total, 1), 2),
        "stray_pixels": stray_px,
        "stray_pixel_pct": round(100.0 * stray_px / seg.size, 4),
        "mean_components": round(float(np.mean(comps_per_label)), 4),
        "max_components": int(np.max(comps_per_label)),
        "islands_above_skimage_min_size": big_islands,
    }


def enforce_connectivity(seg: np.ndarray) -> np.ndarray:
    """Merge every non-primary island into the dominant adjacent label.

    Static-K analogue of skimage's _enforce_label_connectivity: fragments
    are absorbed by a neighboring segment (skimage would promote
    >=min_size fragments to NEW labels, which a static-K pipeline cannot
    represent; island_stats reports how often that case occurs)."""
    from scipy import ndimage

    out = seg.copy()
    s4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    slices = ndimage.find_objects(seg + 1)
    for lab in np.unique(seg):
        sl = slices[lab]
        if sl is None:
            continue
        m = out[sl] == lab
        cc, n = ndimage.label(m, structure=s4)
        if n <= 1:
            continue
        sizes = np.bincount(cc.ravel())[1:]
        keep = int(np.argmax(sizes)) + 1
        for c in range(1, n + 1):
            if c == keep:
                continue
            island = cc == c
            ring = ndimage.binary_dilation(island, structure=s4) & ~island
            neigh = out[sl][ring]
            neigh = neigh[neigh != lab]
            if neigh.size == 0:  # island enclosed by its own label: keep
                continue
            vals, counts = np.unique(neigh, return_counts=True)
            out[sl][island] = vals[np.argmax(counts)]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--ckpt", default=None,
                    help="record dir with checkpoints/ckpt.*.msgpack")
    ap.add_argument("--platform", default="axon")
    ap.add_argument("--scale", type=float, default=0.5)
    ap.add_argument("--sp-area", type=int, default=200)
    ap.add_argument("--out", default=str(REPO / "artifacts" /
                                         "connectivity_r5.json"))
    args = ap.parse_args()

    import jax  # noqa: F401  (import before config, sitecustomize rules)

    from wesup_tpu.runtime import force_platform

    force_platform(args.platform)  # also host-scopes the CPU cache dir
    import jax.numpy as jnp

    from make_dataset import make_dataset
    from wesup_tpu.config import WESUPConfig
    from wesup_tpu.data.datasets import resize_img, resize_mask
    from wesup_tpu.models import wesup
    from wesup_tpu.models.steps import make_predict_step
    from wesup_tpu.ops.slic import n_clusters

    root = Path("/tmp/connectivity_ds")
    if not (root / "val" / "images").exists():
        make_dataset(root, n_train=1, n_val=args.n, hw=(522, 775), seed=7,
                     hard=True)

    config = WESUPConfig(sp_area=args.sp_area)
    params = wesup.init_params(jax.random.PRNGKey(0))
    trained = False
    if args.ckpt:
        import flax.serialization as ser

        ckpts = sorted(Path(args.ckpt).glob("checkpoints/ckpt.*.msgpack"))
        assert ckpts, f"no checkpoints under {args.ckpt}"
        state = ser.msgpack_restore(ckpts[-1].read_bytes())
        params = ser.from_state_dict(params, state["params"])
        trained = True
        print(f"[ckpt] {ckpts[-1]}", file=sys.stderr)

    img_paths = sorted((root / "val" / "images").iterdir())[:args.n]
    mask_paths = sorted((root / "val" / "masks").iterdir())[:args.n]

    import cv2

    # one fixed canvas for all (same-size synthetic images)
    im0 = cv2.cvtColor(cv2.imread(str(img_paths[0])), cv2.COLOR_BGR2RGB)
    th, tw = (int(np.ceil(args.scale * im0.shape[0])),
              int(np.ceil(args.scale * im0.shape[1])))
    Hc, Wc = ((th + 31) // 32) * 32, ((tw + 31) // 32) * 32
    K = n_clusters(Hc, Wc, args.sp_area)

    # seg exactly as production inference computes it (in-jit SLIC)
    predict = make_predict_step(config, (Hc, Wc), mode="superpixel")

    @jax.jit
    def seg_of(image_u8, valid):
        from wesup_tpu.ops.slic import slic

        img = image_u8.astype(jnp.float32) / 255.0
        return jax.vmap(lambda i, v: slic(
            i, v, sp_area=config.sp_area, compactness=config.sp_compactness,
            n_iters=config.slic_iters,
            update_stride=config.slic_update_stride))(img, valid)

    @jax.jit
    def pred_with_seg(params, image_u8, valid, seg):
        img = image_u8.astype(jnp.float32) / 255.0
        out = wesup.forward_superpixel(params, img, seg, K, valid,
                                       jnp.bfloat16, pooling="adjoint",
                                       plan=None)
        return out.pred

    def dice(pred, mask):
        p = pred > 0.5
        m = mask > 0
        return 2.0 * (p & m).sum() / max(p.sum() + m.sum(), 1)

    report = {"n": args.n, "scale": args.scale, "sp_area": args.sp_area,
              "canvas": [Hc, Wc], "K": K, "trained": trained, "images": []}
    t0 = time.time()
    for ip, mp in zip(img_paths, mask_paths):
        img = cv2.cvtColor(cv2.imread(str(ip)), cv2.COLOR_BGR2RGB)
        mask = cv2.imread(str(mp), cv2.IMREAD_GRAYSCALE)
        img = resize_img(img, (th, tw))
        mask = resize_mask(mask, (th, tw))
        canvas = np.zeros((Hc, Wc, 3), np.uint8)
        canvas[:th, :tw] = img
        canvas[:th, tw:] = img[:, -1:]
        canvas[th:] = canvas[th - 1:th]
        valid = np.zeros((Hc, Wc), bool)
        valid[:th, :tw] = True

        seg = np.asarray(seg_of(jnp.asarray(canvas[None]),
                                jnp.asarray(valid[None])))[0]
        stats = island_stats(seg[:th, :tw], args.sp_area)
        seg_enf = seg.copy()
        seg_enf[:th, :tw] = enforce_connectivity(seg[:th, :tw])

        pa = np.asarray(pred_with_seg(params, jnp.asarray(canvas[None]),
                                      jnp.asarray(valid[None]),
                                      jnp.asarray(seg[None])))[0, :th, :tw]
        pb = np.asarray(pred_with_seg(params, jnp.asarray(canvas[None]),
                                      jnp.asarray(valid[None]),
                                      jnp.asarray(seg_enf[None])))[0, :th, :tw]
        entry = {
            **stats,
            "pred_changed_px_pct": round(
                100.0 * float(np.mean((pa > 0.5) != (pb > 0.5))), 4),
            "pred_mean_abs_delta": round(float(np.abs(pa - pb).mean()), 6),
        }
        if trained:
            entry["dice_ours"] = round(float(dice(pa, mask)), 5)
            entry["dice_enforced"] = round(float(dice(pb, mask)), 5)
        report["images"].append(entry)
        print(f"[{ip.name}] {entry}", file=sys.stderr, flush=True)

    agg = {}
    for k in report["images"][0]:
        agg[k] = round(float(np.mean([im[k] for im in report["images"]])), 5)
    report["mean"] = agg
    report["wall_s"] = round(time.time() - t0, 1)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps({"mean": agg, "out": args.out}))


if __name__ == "__main__":
    main()
