"""Multi-epoch quality head-to-head: our jitted trainer vs the torch replica.

The reference itself cannot run in this environment (torchvision / skimage /
albumentations are absent), so the strongest available proof of the Dice-
parity north star (BASELINE.json: "within 0.5%") is a controlled head-to-head
against the in-repo torch replication of the reference training math
(tests/test_model.py::_TorchWESUP + tests/test_loss.py loss fns, each
individually parity-tested against reference semantics, models/wesup.py).

Controls — both sides see literally identical inputs:
  * identical He-init weights (ours converted to torch);
  * identical superpixels (our exact stride-1 SLIC, computed once, shared);
  * identical point labels / majority-vote superpixel stats;
  * reference hyperparameters: SGD(lr=5e-5, momentum=0.9, wd=1e-3),
    loss = CE + 0.5 * propagation-CE at threshold 0.8, unweighted CE
    (the reference's real wiring, models/wesup.py:434, 445-451, 514);
  * fixed epoch order, no augmentation (augmentation divergence is
    quantified separately — PERF_NOTES "augmentation A/B").

What is NOT controlled: floating-point op order (XLA vs torch kernels).
Once fc3 features spread, the 0.8 propagation threshold becomes a discrete
branch whose flips amplify ulp noise — so the acceptance is statistical:
final val Dice within 0.5% (plus early-trajectory loss agreement).

Usage:
    python scripts/quality_headtohead.py [--epochs 60] [--out FILE.json]
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

SP_AREA = 200
LR, MOMENTUM, WD = 5e-5, 0.9, 1e-3
THRESHOLD, PROP_WEIGHT = 0.8, 0.5
CLASS_WEIGHTS = None  # --weighted sets (3, 1), the reference's written
                      # weights (models/wesup.py:434); both sides use it


def load_split(root, split, with_points):
    """[(img f32 [0,1], mask (H,W) u8, point_onehot (H,W,2) or None)]."""
    import cv2

    items = []
    img_dir = Path(root) / split / "images"
    for img_path in sorted(img_dir.iterdir()):
        img = cv2.cvtColor(cv2.imread(str(img_path)), cv2.COLOR_BGR2RGB)
        mask = cv2.imread(str(Path(root) / split / "masks" / img_path.name),
                          cv2.IMREAD_GRAYSCALE)
        pts = None
        if with_points:
            pts = np.zeros((*mask.shape, 2), np.float32)
            csv_path = Path(root) / split / "points" / f"{img_path.stem}.csv"
            for line in csv_path.read_text().splitlines():
                x, y, c = (int(v) for v in line.split(","))
                pts[y, x, c] = 1.0
        items.append((img.astype(np.float32) / 255.0, mask, pts))
    return items


def prepare_problems(items, K):
    """Shared per-image SLIC + superpixel label stats (both sides use these)."""
    import jax.numpy as jnp

    from wesup_tpu.ops.slic import slic
    from wesup_tpu.ops.segments import superpixel_stats

    out = []
    for img, mask, pts in items:
        seg = np.asarray(slic(jnp.asarray(img), sp_area=SP_AREA,
                              update_stride=1))
        sup = pts if pts is not None else None
        stats = superpixel_stats(jnp.asarray(seg), K,
                                 None if sup is None else jnp.asarray(sup))
        out.append({
            "img": img, "mask": mask, "seg": seg,
            "labels": np.asarray(stats.labels),
            "labeled": np.asarray(stats.labeled),
            "real": np.asarray(stats.real),
        })
    return out


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------

def make_ours(K):
    import jax
    import jax.numpy as jnp
    import optax

    from wesup_tpu.models import wesup
    from wesup_tpu.models.objectives import wesup_loss

    tx = optax.chain(optax.add_decayed_weights(WD), optax.trace(MOMENTUM),
                     optax.scale(-LR))

    @jax.jit
    def train_step(params, opt, img, seg, labels, labeled, real):
        def lf(p):
            out = wesup.forward_superpixel(p, img[None], seg[None], K)
            l = wesup_loss(out.sp_pred[0], out.sp_features[0], labels,
                           labeled, real, class_weights=CLASS_WEIGHTS,
                           propagate_threshold=THRESHOLD,
                           propagate_weight=PROP_WEIGHT)
            return l.loss, l.propagated_labels
        (loss, n_prop), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss, n_prop

    @jax.jit
    def predict(params, img, seg):
        out = wesup.forward_superpixel(params, img[None], seg[None], K)
        return out.pred[0]

    return tx, train_step, predict


# ---------------------------------------------------------------------------
# torch replica side
# ---------------------------------------------------------------------------

def make_torch(params):
    import torch

    from test_loss import _torch_propagate, _torch_semi_ce
    from test_model import _TorchWESUP, _copy_weights_to_torch

    tmodel = _TorchWESUP()
    _copy_weights_to_torch(params, tmodel)
    opt = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=MOMENTUM,
                          weight_decay=WD)

    def prep(prob, K):
        oh = np.zeros((prob["seg"].size, K), np.float32)
        oh[np.arange(prob["seg"].size), prob["seg"].reshape(-1)] = 1.0
        sp_maps = torch.from_numpy(
            (oh.T / np.maximum(oh.sum(0)[:, None], 1.0)).astype(np.float32))
        labeled = prob["labeled"]
        order = np.concatenate([np.where(labeled)[0], np.where(~labeled)[0]])
        y_l = torch.from_numpy(prob["labels"][labeled])
        xt = torch.from_numpy(prob["img"]).permute(2, 0, 1)[None]
        return {"sp_maps": sp_maps, "order": order, "y_l": y_l, "xt": xt,
                "seg": prob["seg"]}

    def train_step(tp):
        opt.zero_grad()
        sp_pred, sp_feats = tmodel(tp["xt"], tp["sp_maps"])
        pred_ord, feats_ord = sp_pred[tp["order"]], sp_feats[tp["order"]]
        n_l = len(tp["y_l"])
        ce = _torch_semi_ce(pred_ord[:n_l], tp["y_l"], CLASS_WEIGHTS)
        y_u = _torch_propagate(feats_ord.detach(), tp["y_l"], THRESHOLD)
        pce = _torch_semi_ce(pred_ord[n_l:], y_u, CLASS_WEIGHTS)
        loss = ce + PROP_WEIGHT * pce
        loss.backward()
        opt.step()
        return float(loss), float(y_u.sum())

    def predict(tp):
        with torch.no_grad():
            sp_pred, _ = tmodel(tp["xt"], tp["sp_maps"])
        return sp_pred[:, 1].numpy()[tp["seg"]]

    return tmodel, prep, train_step, predict


def dice(pred_bin, gt_bin):
    inter = float(np.logical_and(pred_bin, gt_bin).sum())
    total = float(pred_bin.sum() + gt_bin.sum())
    return 2.0 * inter / total if total else 1.0


def run(root, epochs, eval_every, log=print):
    from wesup_tpu.runtime import force_platform
    force_platform("cpu")  # torch parity needs strict f32; also host-scopes the CPU cache
    import jax
    import jax.numpy as jnp
    import torch

    torch.manual_seed(0)
    from wesup_tpu.models import wesup
    from wesup_tpu.ops.slic import n_clusters

    train_items = load_split(root, "train", with_points=True)
    val_items = load_split(root, "val", with_points=False)
    H, W = train_items[0][0].shape[:2]
    K = n_clusters(H, W, SP_AREA)
    log(f"[h2h] {len(train_items)} train / {len(val_items)} val images, "
        f"{H}x{W}, K={K}")

    train_probs = prepare_problems(train_items, K)
    val_probs = prepare_problems(val_items, K)

    params = wesup.init_params(jax.random.PRNGKey(1))
    tx, our_step, our_predict = make_ours(K)
    opt = tx.init(params)
    jt = [{k: jnp.asarray(v) for k, v in p.items() if k != "mask"}
          for p in train_probs]

    tmodel, tprep, torch_step, torch_predict = make_torch(params)
    tt = [tprep(p, K) for p in train_probs]
    tv = [tprep(p, K) for p in val_probs]

    def eval_dice():
        ours, theirs = [], []
        for p, tp in zip(val_probs, tv):
            po = np.asarray(our_predict(
                params, jnp.asarray(p["img"]), jnp.asarray(p["seg"])))
            ours.append(dice(np.round(po) > 0, p["mask"] > 0))
            pt = torch_predict(tp)
            theirs.append(dice(np.round(pt) > 0, p["mask"] > 0))
        return float(np.mean(ours)), float(np.mean(theirs))

    hist = {"epoch": [], "ours_dice": [], "torch_dice": [],
            "ours_loss": [], "torch_loss": [],
            "ours_prop": [], "torch_prop": []}
    t0 = time.time()
    for epoch in range(1, epochs + 1):
        ol, tl, op_, tpn = [], [], [], []
        for i in range(len(train_probs)):
            params, opt, loss, n_prop = our_step(
                params, opt, jt[i]["img"], jt[i]["seg"], jt[i]["labels"],
                jt[i]["labeled"], jt[i]["real"])
            l2, np2 = torch_step(tt[i])
            ol.append(float(loss)); tl.append(l2)
            op_.append(float(n_prop)); tpn.append(np2)
        if epoch % eval_every == 0 or epoch == epochs:
            do, dt = eval_dice()
            hist["epoch"].append(epoch)
            hist["ours_dice"].append(do)
            hist["torch_dice"].append(dt)
            hist["ours_loss"].append(float(np.mean(ol)))
            hist["torch_loss"].append(float(np.mean(tl)))
            hist["ours_prop"].append(float(np.mean(op_)))
            hist["torch_prop"].append(float(np.mean(tpn)))
            log(f"[h2h] epoch {epoch:3d}  loss {np.mean(ol):.4f}/"
                f"{np.mean(tl):.4f}  val-dice {do:.4f}/{dt:.4f}  "
                f"prop {np.mean(op_):.1f}/{np.mean(tpn):.1f}  "
                f"({time.time() - t0:.0f}s)")

    final = {
        "ours_final_dice": hist["ours_dice"][-1],
        "torch_final_dice": hist["torch_dice"][-1],
        "dice_delta": abs(hist["ours_dice"][-1] - hist["torch_dice"][-1]),
        "loss_mae": float(np.mean(np.abs(
            np.array(hist["ours_loss"]) - np.array(hist["torch_loss"])))),
        "epochs": epochs, "K": K, "hw": [H, W],
        "n_train": len(train_probs), "n_val": len(val_probs),
        "history": hist,
    }
    return final, params


def run_self_chaos(root, epochs, eval_every, log=print):
    """Control experiment: the SAME torch replica trained twice, one copy's
    init scaled by (1 + 1e-7) — a ~1-ulp f32 perturbation.  Any trajectory
    divergence here is generated by the training dynamics alone (the
    propagation threshold is a discrete branch; class weights steepen the
    transition), with zero cross-framework implementation difference.
    This bounds how much ours-vs-torch divergence the dynamics themselves
    explain."""
    from wesup_tpu.runtime import force_platform
    force_platform("cpu")
    import jax
    import torch

    torch.manual_seed(0)
    from wesup_tpu.models import wesup
    from wesup_tpu.ops.slic import n_clusters

    train_items = load_split(root, "train", with_points=True)
    val_items = load_split(root, "val", with_points=False)
    H, W = train_items[0][0].shape[:2]
    K = n_clusters(H, W, SP_AREA)
    log(f"[chaos] {len(train_items)} train / {len(val_items)} val, "
        f"{H}x{W}, K={K}, weights={CLASS_WEIGHTS}")

    train_probs = prepare_problems(train_items, K)
    val_probs = prepare_problems(val_items, K)

    params = wesup.init_params(jax.random.PRNGKey(1))
    paramsB = jax.tree.map(lambda x: x * (1.0 + 1e-7), params)
    _, prep, stepA, predictA = make_torch(params)
    _, _, stepB, predictB = make_torch(paramsB)
    tt = [prep(p, K) for p in train_probs]
    tv = [prep(p, K) for p in val_probs]

    hist = {"epoch": [], "a_dice": [], "b_dice": [],
            "a_loss": [], "b_loss": []}
    t0 = time.time()
    for epoch in range(1, epochs + 1):
        la, lb = [], []
        for tp in tt:
            la.append(stepA(tp)[0])
            lb.append(stepB(tp)[0])
        if epoch % eval_every == 0 or epoch == epochs:
            da = float(np.mean([
                dice(np.round(predictA(tp)) > 0, p["mask"] > 0)
                for p, tp in zip(val_probs, tv)]))
            db = float(np.mean([
                dice(np.round(predictB(tp)) > 0, p["mask"] > 0)
                for p, tp in zip(val_probs, tv)]))
            hist["epoch"].append(epoch)
            hist["a_dice"].append(da)
            hist["b_dice"].append(db)
            hist["a_loss"].append(float(np.mean(la)))
            hist["b_loss"].append(float(np.mean(lb)))
            log(f"[chaos] epoch {epoch:3d}  loss {np.mean(la):.4f}/"
                f"{np.mean(lb):.4f}  val-dice {da:.4f}/{db:.4f}  "
                f"({time.time() - t0:.0f}s)")
    return {
        "final_a_dice": hist["a_dice"][-1],
        "final_b_dice": hist["b_dice"][-1],
        "dice_delta": abs(hist["a_dice"][-1] - hist["b_dice"][-1]),
        "max_traj_delta": float(max(abs(a - b) for a, b in
                                    zip(hist["a_dice"], hist["b_dice"]))),
        "epochs": epochs, "weights": CLASS_WEIGHTS, "history": hist,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None,
                    help="dataset root (default: synth into a temp dir)")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--n-train", type=int, default=12)
    ap.add_argument("--n-val", type=int, default=4)
    ap.add_argument("--hw", type=int, nargs=2, default=(96, 128))
    ap.add_argument("--out", default="/tmp/headtohead.json")
    ap.add_argument("--weighted", action="store_true",
                    help="use the reference's written (3,1) class weights "
                         "on BOTH sides (earlier Dice breakthrough)")
    ap.add_argument("--self-chaos", action="store_true",
                    help="control: torch replica vs itself with a 1-ulp "
                         "init perturbation (no cross-framework diff)")
    ap.add_argument("--lr", type=float, default=None,
                    help="override SGD lr on BOTH sides")
    args = ap.parse_args()

    global CLASS_WEIGHTS, LR
    if args.weighted:
        CLASS_WEIGHTS = (3, 1)
    if args.lr is not None:
        LR = args.lr

    root = args.root
    if root is None:
        import tempfile

        from make_dataset import make_dataset

        root = tempfile.mkdtemp(prefix="h2h_")
        make_dataset(root, n_train=args.n_train, n_val=args.n_val,
                     hw=tuple(args.hw), seed=0)

    if args.self_chaos:
        final = run_self_chaos(root, args.epochs, args.eval_every)
        Path(args.out).write_text(json.dumps(final, indent=2))
        print(f"[chaos] final dice A={final['final_a_dice']:.4f} "
              f"B={final['final_b_dice']:.4f} "
              f"delta={final['dice_delta']:.4f} "
              f"max-traj-delta={final['max_traj_delta']:.4f} -> {args.out}")
        return

    final, _ = run(root, args.epochs, args.eval_every)
    Path(args.out).write_text(json.dumps(final, indent=2))
    print(f"[h2h] final dice ours={final['ours_final_dice']:.4f} "
          f"torch={final['torch_final_dice']:.4f} "
          f"delta={final['dice_delta']:.4f} -> {args.out}")


if __name__ == "__main__":
    main()
