"""End-to-end training-epoch profiler at GlaS scale (85 images, B=8).

The north-star metric is images/sec as a user's wall clock sees it — a full
epoch including host decode/resize/canvas prep, H2D transfer, dispatch and
the device step — not the device step alone.  This script measures both side
by side and decomposes the per-batch host path so the gap is attributable:

  wait_host   blocking on the loader queue (decode + cv2 resize + canvas)
  rng         per-batch PRNG derivation (jax.random.fold_in chain)
  put         jax.device_put of the batch pytree (tunnel RPC + transfer)
  dispatch    the jitted step call (async dispatch; RPC overhead)
  drain       phase-end device_get of the metric accumulator

Usage:
    python scripts/profile_epoch.py [epochs] [batch] [n_images] [fixed|bucket]

Defaults: 4 epochs, B=8, 85 images (GlaS train-set size) at 522x775
(GlaS image size), fixed 224x320 canvas (the 0.4-scale multiscale maximum,
one XLA program).  'bucket' uses the production bucketed-canvas default
(several programs; epoch 1 pays their compiles).

Reference analog: DataLoader(num_workers=os.cpu_count()) hides host prep
behind many cores (/root/reference/models/base.py:288-300); this host has
ONE core, so the prep/transfer pipeline must overlap the device instead.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

GLAS_HW = (522, 775)
DATASET_ROOT = Path("/tmp/wesup_glas85")


def ensure_dataset(n_images):
    root = DATASET_ROOT / str(n_images)
    marker = root / ".complete"
    if marker.exists():
        return root
    from make_dataset import make_dataset

    print(f"[dataset] generating {n_images} x {GLAS_HW} images at {root} ...",
          file=sys.stderr)
    t0 = time.time()
    make_dataset(root, n_train=n_images, n_val=0, hw=GLAS_HW, with_points=True)
    marker.touch()
    print(f"[dataset] done in {time.time() - t0:.0f}s", file=sys.stderr)
    return root


def build_trainer(batch, mode, resize="auto"):
    from wesup_tpu.models import initialize_trainer

    kwargs = dict(batch_size=batch, checkpoint_period=0, device_resize=resize)
    if mode == "fixed":
        # the 0.4-scale maximum of 522x775 content, 32-aligned: one program
        kwargs["canvas_size"] = (224, 320)
    return initialize_trainer("wesup", **kwargs)


def instrumented_epoch(trainer, loader, epoch_idx):
    """The pre-pipelining consumer loop with a stopwatch on each stage."""
    import jax

    from wesup_tpu.models import steps

    trainer._epoch_idx = epoch_idx
    t = {"wait_host": 0.0, "rng": 0.0, "put": 0.0, "dispatch": 0.0,
         "drain": 0.0}
    acc = steps.init_metric_acc(steps.TRAIN_METRIC_KEYS)
    t_epoch = time.time()
    it = iter(loader)
    i = 0
    n_images = 0
    while True:
        t0 = time.time()
        try:
            batch = next(it)
        except StopIteration:
            break
        t1 = time.time()
        rng = trainer._batch_rng("train", i)
        t2 = time.time()
        step = trainer._get_step("train", trainer._batch_hw(batch))
        dev_batch = trainer._put_batch(batch)
        t3 = time.time()
        cache = (trainer._resize_cache.get("train")
                 if "img_idx" in batch else None)
        trainer.params, trainer.opt_state, acc = step(
            trainer.params, trainer.opt_state, acc, dev_batch, rng, cache)
        t4 = time.time()
        t["wait_host"] += t1 - t0
        t["rng"] += t2 - t1
        t["put"] += t3 - t2
        t["dispatch"] += t4 - t3
        i += 1
        n_images += int(batch["sample_valid"].sum())
    t0 = time.time()
    acc = jax.device_get(acc)
    t["drain"] = time.time() - t0
    wall = time.time() - t_epoch
    return wall, t, i, n_images


def pipelined_epoch(trainer, loader, epoch_idx):
    """The production train-phase loop (whatever trainer.py currently does)."""
    trainer._epoch_idx = epoch_idx
    trainer.tracker.start_new_epoch(trainer.current_lr())
    trainer.tracker.train()
    t_epoch = time.time()
    trainer._train_phase_loop(loader)
    return time.time() - t_epoch


def step_only_throughput(trainer, loader, batch_size):
    """Steady-state step wall time at the loader's canvas, batch pre-staged
    on device (the number PERF_NOTES quotes as 'train step')."""
    import jax

    from wesup_tpu.models import steps

    batch = next(iter(loader))
    hw = trainer._batch_hw(batch)
    step = trainer._get_step("train", hw)
    dev_batch = trainer._put_batch(batch)
    rng = trainer._batch_rng("train", 0)
    cache = (trainer._resize_cache.get("train")
             if "img_idx" in batch else None)
    acc = steps.init_metric_acc(steps.TRAIN_METRIC_KEYS)
    p, o = trainer.params, trainer.opt_state
    p, o, acc = step(p, o, acc, dev_batch, rng, cache)
    jax.block_until_ready(acc["count"])
    n = 10
    t0 = time.time()
    for _ in range(n):
        p, o, acc = step(p, o, acc, dev_batch, rng, cache)
    jax.block_until_ready(acc["count"])
    dt = (time.time() - t0) / n
    return dt, hw


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_images = int(sys.argv[3]) if len(sys.argv) > 3 else 85
    mode = sys.argv[4] if len(sys.argv) > 4 else "fixed"
    loop = sys.argv[5] if len(sys.argv) > 5 else "both"  # instrument|pipeline|both
    resize = sys.argv[6] if len(sys.argv) > 6 else "auto"  # auto|on|off

    root = ensure_dataset(n_images)

    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    trainer = build_trainer(batch, mode, resize)
    trainer.setup_dataloaders(root / "train", None)
    loader = trainer.dataloaders["train"]
    trainer.tracker.start_new_epoch(trainer.current_lr())
    trainer.tracker.train()

    report = {"batch": batch, "n_images": n_images, "mode": mode,
              "resize": resize, "epochs": []}
    for e in range(1, epochs + 1):
        if loop in ("instrument", "both"):
            wall, parts, n_batches, n_valid = instrumented_epoch(
                trainer, loader, e)
            ips = n_valid / wall
            overhead = {k: round(v, 3) for k, v in parts.items()}
            print(f"[epoch {e}] instrumented wall {wall:.2f}s "
                  f"({n_batches} batches, {n_valid} imgs) -> {ips:.1f} img/s | "
                  + " ".join(f"{k}={v:.2f}s" for k, v in parts.items()),
                  file=sys.stderr)
            report["epochs"].append({"epoch": e, "loop": "instrument",
                                     "wall_s": round(wall, 3),
                                     "img_per_s": round(ips, 1),
                                     "batches": n_batches, **overhead})
        if loop in ("pipeline", "both"):
            wall = pipelined_epoch(trainer, loader, e)
            ips = n_images / wall
            print(f"[epoch {e}] production loop wall {wall:.2f}s -> "
                  f"{ips:.1f} img/s", file=sys.stderr)
            report["epochs"].append({"epoch": e, "loop": "pipeline",
                                     "wall_s": round(wall, 3),
                                     "img_per_s": round(ips, 1)})

    dt, hw = step_only_throughput(trainer, loader, batch)
    step_ips = batch / dt
    print(f"[step-only] {dt * 1e3:.1f} ms/step at {hw} B={batch} -> "
          f"{step_ips:.1f} img/s", file=sys.stderr)
    report["step_only"] = {"ms_per_step": round(dt * 1e3, 1),
                           "img_per_s": round(step_ips, 1), "canvas": hw}
    steady = [ep for ep in report["epochs"] if ep["epoch"] > 1]
    if steady:
        best = max(ep["img_per_s"] for ep in steady)
        report["wall_over_step"] = round(best / step_ips, 3)
        print(f"[ratio] best steady epoch wall {best:.1f} img/s = "
              f"{100 * best / step_ips:.0f}% of step-only {step_ips:.1f}",
              file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
