"""Measure the host-side extra-eval-metrics path (VERDICT r2 item 8).

The default val phase keeps accuracy/dice on device (zero per-step D2H).
``metrics=object_dice`` must fetch every batch's full prediction map to the
host — through this box's ~30 ms/RPC tunnel that could serialize the phase.
WESUPTrainer defers the fetches until after the step loop so they ride
behind queued compute (wesup_tpu/models/trainer.py::_run_val_phase).

This driver times the val phase three ways on a GlaS-scale val split:
  default            device metrics only (no fetches)
  object_dice        deferred fetches + host contest metric (production path)
  object_dice-eager  fetches inline inside the step loop (the naive
                     implementation, patched in for comparison)

Usage:
    python scripts/measure_eval_metrics.py [--n-val 8] [--platform axon]
"""

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")


def build(root, n_val, hw):
    from make_dataset import make_dataset

    root = Path(root)
    if not (root / "val" / "images").exists():
        make_dataset(root, n_train=2, n_val=n_val, hw=hw, seed=0,
                     with_points=True)
    return root


def time_val_phase(root, metrics, eager, repeats=3):
    from wesup_tpu.models import initialize_trainer
    from wesup_tpu.models.trainer import WESUPTrainer

    os.environ["RECORD_ROOT"] = str(Path(root) / "records")
    trainer = initialize_trainer("wesup", epochs=1, seed=0, metrics=metrics)
    trainer.setup_optimizer()
    trainer.setup_dataloaders(Path(root) / "train", Path(root) / "val")

    orig_loop_body = None
    if eager:
        # naive variant: fetch inside the loop (blocks per step)
        orig = WESUPTrainer._run_val_phase

        def eager_phase(self):
            # identical to the production _run_val_phase except the fetch
            # placement: block on each step's result IMMEDIATELY (the naive
            # implementation), reusing the trainer's own host-eval helper so
            # the comparison stays apples-to-apples as the trainer evolves
            loader = self.dataloaders["val"]
            spec = loader.spec
            from wesup_tpu.models import steps
            step = self._get_step("eval", (spec.height, spec.width))
            acc = steps.init_metric_acc(steps.EVAL_METRIC_KEYS)
            extra_fns = self._resolve_extra_metric_fns()
            host_preds, host_targets = [], []
            for i, batch in enumerate(loader):
                dev_batch = self._put_batch(batch)
                pred, acc = step(self.params, acc, dev_batch,
                                 self._batch_rng("val", i))
                if extra_fns:
                    self._collect_host_eval(self._fetch_pred(pred), batch,
                                            host_preds, host_targets)
            self._track_acc(acc)
            if extra_fns and host_preds:
                self.tracker.step(
                    self.evaluate_host(extra_fns, host_preds, host_targets))

        WESUPTrainer._run_val_phase = eager_phase
        orig_loop_body = orig

    trainer._epoch_idx = 1
    trainer.tracker.start_new_epoch(trainer.current_lr())
    trainer._run_val_phase()  # warmup/compile
    times = []
    for _ in range(repeats):
        trainer.tracker.start_new_epoch(trainer.current_lr())
        t0 = time.perf_counter()
        trainer._run_val_phase()
        times.append(time.perf_counter() - t0)
    if orig_loop_body is not None:
        WESUPTrainer._run_val_phase = orig_loop_body
    return min(times), sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-val", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(522, 775))
    ap.add_argument("--root", default="/tmp/eval_metrics_ds")
    ap.add_argument("--platform", default=None, choices=(None, "cpu", "axon"))
    args = ap.parse_args()

    if args.platform:
        from wesup_tpu import runtime
        runtime.force_platform(args.platform)

    root = build(args.root, args.n_val, tuple(args.hw))
    for label, metrics, eager in (
            ("default (device metrics)", None, False),
            ("object_dice deferred", "object_dice", False),
            ("object_dice eager", "object_dice", True)):
        best, med = time_val_phase(root, metrics, eager)
        print(f"{label:28s}  min {best * 1e3:8.1f} ms   med {med * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
