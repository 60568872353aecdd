"""WESUPTrainer: wires config, data, jitted steps, mesh, and records.

Parity targets (reference models/wesup.py:403-547): dataset selection by
``points/`` presence, SGD(lr=5e-5, momentum, weight_decay) over trainable
params, loss = CE + 0.5 * propagation CE, tracked metrics
(loss/accuracy/dice/labeled_sp_ratio/propagated_labels/propagate_loss),
per-epoch history + checkpoints.

TPU-native: preprocessing (augment + SLIC) happens inside the jitted step;
batches ride a ('data', 'model') mesh; params live replicated (or
tensor-parallel for the MLP) as jax.Arrays with explicit shardings.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WESUPConfig, merge_config
from ..data.datasets import Digest2019PointDataset, SegmentationDataset
from ..data.loader import CanvasBatcher, CanvasSpec, infer_canvas
from ..parallel import (batch_sharding, make_mesh, param_sharding,
                        replicated_sharding)
from . import steps, wesup
from .base import BaseTrainer, timed_phase


class WESUPTrainer(BaseTrainer):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.config = merge_config(WESUPConfig(), **kwargs)
        # reference merges config defaults into kwargs (models/wesup.py:430)
        # so the record dir's params/<n>.json snapshots the full effective
        # configuration, not just the CLI overrides
        self.kwargs = {**self.config.to_dict(), **self.kwargs}
        self.mesh = make_mesh(self.config.num_devices,
                              kwargs.get("model_parallel", 1))

        key = jax.random.PRNGKey(self.config.seed)
        self.params = wesup.init_params(key, n_classes=self.config.n_classes,
                                        D=self.config.sp_feature_dim,
                                        fc_width=self.config.fc_width)
        self.tx = steps.make_optimizer(self.config)
        self.opt_state = self.tx.init(self.params)
        self._rng = jax.random.PRNGKey(self.config.seed + 1)
        self._epoch_idx = 0  # set per epoch by BaseTrainer.train
        self._step_cache = {}
        self.dataloaders = {}
        self._place_state()

    # ------------------------------------------------------------------
    # state management
    # ------------------------------------------------------------------

    def _place_state(self):
        rep = replicated_sharding(self.mesh)
        pspec = param_sharding(self.mesh, self.params)
        self.params = jax.tree.map(
            lambda x, s: jax.device_put(jnp.asarray(x), s), self.params, pspec)
        self.opt_state = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), rep), self.opt_state)

    def state_dict(self):
        import flax.serialization as ser

        return {
            "params": ser.to_state_dict(
                jax.tree.map(np.asarray, self.params)),
            "opt_state": ser.to_state_dict(
                jax.tree.map(np.asarray, self.opt_state)),
        }

    def load_state_dict(self, state):
        import flax.serialization as ser

        self.params = ser.from_state_dict(self.params, state["params"])
        if "opt_state" in state:
            self.opt_state = ser.from_state_dict(self.opt_state,
                                                 state["opt_state"])
        self._place_state()

    def load_torch_model_state(self, state_dict):
        self.params = wesup.convert_torch_state_dict(state_dict)
        self.opt_state = self.tx.init(self.params)
        self._place_state()

    def setup_optimizer(self):
        pass  # built in __init__; epochs/CLI kwargs don't change it

    def current_lr(self):
        return float(self.config.lr)

    # ------------------------------------------------------------------
    # data (reference get_default_dataset, models/wesup.py:436-443)
    # ------------------------------------------------------------------

    def get_default_dataset(self, root_dir, train=True, proportion=1.0):
        root_dir = Path(root_dir)
        if train:
            if (root_dir / "points").exists():
                return Digest2019PointDataset(
                    root_dir, proportion=proportion,
                    multiscale_range=self.config.multiscale_range,
                    seed=self.config.seed)
            return SegmentationDataset(
                root_dir, proportion=proportion,
                multiscale_range=self.config.multiscale_range,
                seed=self.config.seed)
        return SegmentationDataset(
            root_dir, rescale_factor=self.config.rescale_factor, train=False)

    def setup_dataloaders(self, train_path, val_path, proportion=1.0):
        bs = int(self.kwargs.get("batch_size", self.config.batch_size))
        # DP is the default training story: any batch size works over any
        # mesh — the loader pads every batch with sample_valid=False blanks
        # to a multiple of the data-shard count, so batches always shard
        # cleanly (blanks contribute nothing to loss/metrics/gradients)
        n_data = self.mesh.shape.get("data", 1)

        train_ds = self.get_default_dataset(train_path, proportion=proportion)
        train_ds.summary(logger=self.logger)
        self._point_mode = (Path(train_path) / "points").exists()
        self._setup_resize_cache("train", train_ds)
        canvas = self.config.canvas_size
        if canvas is not None:
            spec = CanvasSpec(canvas[0], canvas[1], n_classes=self.config.n_classes)
            bucket = False
        else:
            spec = infer_canvas(train_ds, n_classes=self.config.n_classes)
            # per-sample 32-aligned canvas buckets: ~25% less padding compute
            # at multiscale (0.3, 0.4) for a few extra compilations
            bucket = True
        self.logger.info(f"Train canvas: {spec.height}x{spec.width}"
                         + (" (bucketed)" if bucket else ""))
        self.dataloaders = {
            "train": CanvasBatcher(train_ds, spec, batch_size=bs, shuffle=True,
                                   seed=self.config.seed, bucket=bucket,
                                   shard_multiple=n_data)
        }
        self._train_spec = spec
        # shuffle-epoch counter for the train loader (mirrors the batcher's
        # own __iter__ counter so lookahead epochs shuffle identically)
        self._train_iters = 0
        self._cancel_lookahead()

        if val_path is not None:
            val_ds = self.get_default_dataset(val_path, train=False)
            val_ds.summary(logger=self.logger)
            self._setup_resize_cache("val", val_ds)
            vspec = infer_canvas(val_ds, n_classes=self.config.n_classes)
            self.logger.info(f"Val canvas: {vspec.height}x{vspec.width}")
            self.dataloaders["val"] = CanvasBatcher(val_ds, vspec,
                                                    batch_size=max(1, n_data),
                                                    shard_multiple=n_data)

    # device-resize cache size cap ("auto" mode falls back to host resize
    # above this): GlaS-85 is ~140 MB; 4 GB leaves HBM for the model
    _RESIZE_CACHE_CAP = 4 << 30

    def _setup_resize_cache(self, phase: str, dataset):
        """Enable the device-resize path (ops/train_resize.py) for a phase.

        Ships the dataset's full-resolution decode to the device ONCE; the
        per-epoch cv2 resize then runs bit-exactly inside the jitted step,
        deleting the producer's dominant per-epoch host cost (PERF_NOTES
        item 38: ~0.2 s/epoch of decode+resize+canvas CPU time-slicing one
        core against a ~0.27 s device program) and cutting wire bytes per
        batch from ~2.3 MB to ~80 KB.  Histories are byte-identical
        (tests/test_train_resize.py + test_train_parity.py)."""
        mode = str(getattr(self.config, "device_resize", "off")).lower()
        if not hasattr(self, "_resize_cache"):
            self._resize_cache = {}
        self._resize_cache[phase] = None
        if mode in ("off", "false", "0", "none"):
            return
        if phase == "val" and self.kwargs.get("metrics"):
            # the extra-metrics path reads per-sample masks host-side
            # (_collect_host_eval); keep the host wire format there
            return
        from ..ops.train_resize import build_cache

        host = build_cache(dataset, max_bytes=self._RESIZE_CACHE_CAP)
        if host is None:
            if mode in ("on", "true", "1"):
                raise ValueError(
                    f"device_resize='on' but the {phase} dataset cannot be "
                    "cached losslessly (missing/over-range masks or above "
                    "the size cap)")
            return
        rep = replicated_sharding(self.mesh)
        self._resize_cache[phase] = {
            k: jax.device_put(v, rep) for k, v in host.items()}
        dataset.device_resize = True
        self.logger.info(
            f"Device resize ({phase}): {host['imgs'].shape[0]} images "
            f"cached on device ({host['imgs'].nbytes / 1e6:.0f} MB)")

    # ------------------------------------------------------------------
    # steps
    # ------------------------------------------------------------------

    def _get_step(self, kind: str, hw):
        key = (kind, hw)
        if key not in self._step_cache:
            if kind == "train":
                self._step_cache[key] = steps.make_train_step(
                    self.config, hw, point_mode=self._point_mode, tx=self.tx)
            else:
                self._step_cache[key] = steps.make_eval_step(self.config, hw)
        return self._step_cache[key]

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _batch_rng(self, phase: str, batch_idx: int):
        """Deterministic per-(epoch, phase, batch) key.

        Counter-derived (fold_in) instead of split-chaining so the train
        stream does not depend on how many batches any OTHER phase emitted —
        e.g. the val loader's batch count changes with the mesh's data-shard
        count, and chaining would shift every later epoch's augmentation.
        Also makes resume exactly reproduce the original epoch keys.

        The production loop does NOT call this per batch: it ships (epoch,
        batch_idx) on the wire and the step derives the identical key in-jit
        (steps._batch_rng_key) — host-side derivation cost 3 tiny device
        programs per batch, 33 extra tunnel dispatches per GlaS-85 epoch
        (PERF_NOTES round-4 epoch entry).  Kept for scripts/tests that drive
        steps directly.
        """
        key = jax.random.fold_in(self._rng, self._epoch_idx)
        key = jax.random.fold_in(key, 0 if phase == "train" else 1)
        return jax.random.fold_in(key, batch_idx)

    @staticmethod
    def _batch_hw(batch) -> tuple:
        """Canvas (H, W) of a batch in either wire format (device-resize
        batches carry no image; the vector lengths ARE the canvas)."""
        if "image" in batch:
            hw = batch["image"].shape[1:3]
        else:
            hw = (batch["rsz_iy"].shape[1], batch["rsz_ix"].shape[1])
        return (int(hw[0]), int(hw[1]))

    def _put_batch(self, batch, rng_idx=None):
        sh = batch_sharding(self.mesh)
        B = batch["sample_valid"].shape[0]
        if B % self.mesh.shape.get("data", 1) != 0:
            sh = replicated_sharding(self.mesh)
        # ONE device_put of the whole pytree with ONE sharding (the batched
        # transfer path — a pytree of per-leaf shardings or per-array puts
        # costs one ~25 ms tunnel RPC per leaf), with the wire bytes cut to
        # the minimum: the (B, H, W) bool validity mask is always a stack of
        # top-left content rectangles (loader.place_on_canvas), so only the
        # (B, 2) extents travel and the step rebuilds the mask on device;
        # pixel_mask travels as int8 (-1 or a class index < 128).  Measured
        # tunnel H2D is bandwidth-bound at ~90 MB/s, so bytes ARE seconds:
        # 4.6 -> 2.3 MB per B=8 224x320 batch (PERF_NOTES round-4).
        wire = {k: v for k, v in batch.items() if k != "valid"}
        if rng_idx is not None:
            # (epoch, batch_idx) rows, one per sample so the leaf shards over
            # 'data' like the rest of the batch; the step folds them into its
            # base key in-jit (steps._batch_rng_key)
            wire["rng_idx"] = np.tile(np.asarray(rng_idx, np.int32), (B, 1))
        if "content_hw" not in wire and "valid" in batch:
            wire["content_hw"] = np.stack(
                [batch["valid"].any(axis=2).sum(axis=1).astype(np.int32),
                 batch["valid"].any(axis=1).sum(axis=1).astype(np.int32)],
                axis=-1)
        pm = batch.get("pixel_mask")  # absent on device-resize batches
        if (pm is not None and pm.dtype != np.int8
                and -128 <= pm.min() and pm.max() <= 127):
            # lossless downcast only: a mask with class values > 127 (e.g.
            # raw 0/255 masks, which the reference would also treat as class
            # 255) keeps its dtype rather than silently wrapping
            wire["pixel_mask"] = pm.astype(np.int8)
        return jax.device_put(wire, sh)

    # staged H2D depth: the upload of batches i+1..i+depth overlaps step i's
    # device compute; 2 keeps one full batch of slack without pinning more
    # than ~2 canvas batches of extra HBM
    _STAGE_DEPTH = 2

    def _start_staged(self, batch_iter, epoch: int):
        """EAGERLY start the staging chain over ``batch_iter``: a thread
        that decodes/builds batches (via the loader's own producer thread),
        derives the wire rng rows and device_puts, ``_STAGE_DEPTH`` batches
        in flight.  Returns ``(iterator, cancel_event)`` — the threads run
        from this call, so a chain started for epoch e+1 overlaps epoch e's
        metric drain / val phase / record write (cross-epoch lookahead).

        The reference hides host prep behind DataLoader worker processes
        (models/base.py:288-300); this single-core host instead overlaps the
        host costs that serialized with device compute — decode + resize +
        canvas build, device_put (tunnel RPC + transfer) and PRNG derivation.
        Transfer errors follow the same per-iteration RuntimeError swallow
        policy as step errors (models/base.py:234-237).  Setting the cancel
        event abandons the chain (threads exit at their next queue put).
        """
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self._STAGE_DEPTH)
        SENTINEL = object()
        cancel = threading.Event()

        def _put(item) -> bool:
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        def worker():
            try:
                for i, batch in enumerate(batch_iter):
                    if cancel.is_set():
                        return
                    try:
                        # ship (epoch, i) on the wire; the step derives the
                        # per-batch key in-jit from the base key — zero
                        # per-batch host/device PRNG work on this thread
                        dev_batch = self._put_batch(batch, rng_idx=(epoch, i))
                    except RuntimeError as ex:
                        self.logger.exception(ex)
                        continue
                    if not _put((batch, dev_batch, self._rng)):
                        return
            except BaseException as ex:  # loader errors surface to the consumer
                _put(ex)
            finally:
                _put(SENTINEL)

        threading.Thread(target=worker, daemon=True).start()

        def consume():
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item

        return consume(), cancel

    def _staged_batches(self, loader, phase: str):
        """One phase's staged batches at the CURRENT epoch (val phase and
        direct drivers; the train phase goes through the lookahead path)."""
        it, _ = self._start_staged(iter(loader), self._epoch_idx)
        return it

    def _take_lookahead(self, loader):
        """Claim the pre-warmed staging chain if it matches this epoch."""
        la = getattr(self, "_staged_lookahead", None)
        self._staged_lookahead = None
        if la is None:
            return None
        epoch, ldr, it, cancel = la
        if ldr is loader and epoch == self._epoch_idx:
            return it
        cancel.set()  # nonstandard epoch sequence: abandon the chain
        return None

    def _cancel_lookahead(self):
        la = getattr(self, "_staged_lookahead", None)
        self._staged_lookahead = None
        if la is not None:
            la[3].set()

    def train(self, data_root, **kwargs):
        try:
            return super().train(data_root, **kwargs)
        finally:
            # the last epoch's pre-warmed chain must not keep staging
            # while post-training inference/eval uses the device
            self._cancel_lookahead()

    # ------------------------------------------------------------------
    # epoch loop
    # ------------------------------------------------------------------

    def train_one_epoch(self, no_val=False):
        phases = ["train"] if no_val else ["train", "val"]
        for phase in phases:
            with timed_phase(self.logger, phase):
                if phase == "train":
                    self.tracker.train()
                    self._run_train_phase()
                else:
                    self.tracker.eval()
                    self._run_val_phase()
            self.logger.info(self.tracker.log())

    def _run_train_phase(self):
        loader = self.dataloaders["train"]
        # tracing/profiling subsystem (SURVEY.md §5): `profile_dir=...` traces
        # the first profiled epoch's steps into a Perfetto/XPlane dump viewable
        # in xprof/tensorboard; the reference has only wall-clock phase timing
        # (models/base.py:224,239).
        profile_dir = self.kwargs.get("profile_dir")
        if profile_dir and not getattr(self, "_profiled", False):
            import jax.profiler

            self._profiled = True
            jax.profiler.start_trace(str(profile_dir))
            try:
                self._train_phase_loop(loader)
            finally:
                jax.profiler.stop_trace()
                self.logger.info(f"Profiler trace written to {profile_dir}")
            return
        self._train_phase_loop(loader)

    def _train_phase_loop(self, loader):
        # metrics accumulate ON DEVICE (the axon tunnel costs ~30 ms per
        # device->host transfer; per-step fetching tripled the step time);
        # one fetch at phase end, NaN abort checked there (reference aborts
        # mid-epoch, models/base.py:202-203 -- observationally equivalent
        # since the epoch's history would be discarded either way)
        acc = steps.init_metric_acc(steps.TRAIN_METRIC_KEYS)
        staged = self._take_lookahead(loader)
        if staged is None:
            staged, _ = self._start_staged(
                loader.epoch_iter(getattr(self, "_train_iters", 0)),
                self._epoch_idx)
        self._train_iters = getattr(self, "_train_iters", 0) + 1
        cache = getattr(self, "_resize_cache", {}).get("train")
        for batch, dev_batch, rng in staged:
            try:
                hw = self._batch_hw(batch)
                step = self._get_step("train", hw)
                self.params, self.opt_state, acc = step(
                    self.params, self.opt_state, acc, dev_batch, rng,
                    cache if "img_idx" in batch else None)
            except RuntimeError as ex:  # parity: swallow per-iteration errors
                self.logger.exception(ex)
        # pre-warm epoch e+1's chain NOW: its decode/resize/canvas and H2D
        # overlap this epoch's metric drain, the val phase and the record
        # write — the measured per-epoch cold start of the host pipeline
        # (PERF_NOTES round-4 epoch entry)
        it, cancel = self._start_staged(
            loader.epoch_iter(self._train_iters), self._epoch_idx + 1)
        self._staged_lookahead = (self._epoch_idx + 1, loader, it, cancel)
        self._track_acc(acc)

    def _resolve_extra_metric_fns(self):
        """Pluggable eval metrics (reference train.py:26-27 /
        models/base.py:335-360 accept metric FUNCTIONS; the CLI passes
        names, e.g. ``metrics=accuracy,dice,object_dice``).

        accuracy/dice already run on device inside the jitted eval step;
        anything else (contest metrics etc.) is evaluated host-side on the
        val predictions via BaseTrainer.evaluate_host.
        """
        from ..utils import metrics as metrics_mod

        spec = self.kwargs.get("metrics")
        if spec is None:
            return []
        if isinstance(spec, str) or callable(spec):
            spec = [spec]
        fns = []
        for m in spec:
            fn = m if callable(m) else getattr(metrics_mod, str(m), None)
            if fn is None:
                raise ValueError(f"unknown metric: {m!r} (not a function in "
                                 "wesup_tpu.utils.metrics)")
            if fn.__name__ not in ("accuracy", "dice"):
                fns.append(fn)
        return fns

    # device prediction buffers kept in flight on the extra-metrics path:
    # fetching step i-W only after dispatching step i overlaps every D2H
    # with queued compute while pinning just W extra maps in HBM
    _PENDING_WINDOW = 2

    def _fetch_pred(self, pred):
        """D2H fetch of one batch's prediction map (extra-metrics path ONLY;
        the default path must never call this per step — guarded by
        tests/test_train_smoke.py::test_default_path_fetches_no_predictions)."""
        return np.asarray(pred)

    def _collect_host_eval(self, pred_np, batch, host_preds, host_targets):
        """Crop one fetched batch to per-sample valid content for the
        host-side extra metrics (shared with scripts/measure_eval_metrics)."""
        for b in range(pred_np.shape[0]):
            if not batch["sample_valid"][b]:
                continue
            if not (batch["pixel_mask"][b] >= 0).any():
                continue
            h = int(batch["valid"][b].any(axis=1).sum())
            w = int(batch["valid"][b].any(axis=0).sum())
            host_preds.append(
                np.round(pred_np[b, :h, :w]).astype(np.int32))
            host_targets.append(batch["pixel_mask"][b, :h, :w])

    def _drain_one(self, pending, host_preds, host_targets):
        pred, batch = pending.pop(0)
        try:
            pred_np = self._fetch_pred(pred)
        except RuntimeError as ex:
            # same per-iteration swallow policy as the step loop
            # (reference models/base.py:234-237)
            self.logger.exception(ex)
            return
        self._collect_host_eval(pred_np, batch, host_preds, host_targets)

    def _run_val_phase(self):
        loader = self.dataloaders["val"]
        spec = loader.spec
        step = self._get_step("eval", (spec.height, spec.width))
        acc = steps.init_metric_acc(steps.EVAL_METRIC_KEYS)
        extra_fns = self._resolve_extra_metric_fns()
        pending = []  # (device pred, host batch) — bounded sliding window
        host_preds, host_targets = [], []
        cache = getattr(self, "_resize_cache", {}).get("val")
        for batch, dev_batch, rng in self._staged_batches(loader, "val"):
            try:
                pred, acc = step(self.params, acc, dev_batch, rng,
                                 cache if "img_idx" in batch else None)
                if extra_fns:
                    # keep the DEVICE array; fetching here would block this
                    # host thread on step i's completion (~30 ms/RPC tunnel)
                    # and serialize compute with transfer
                    pending.append((pred, batch))
                    if len(pending) > self._PENDING_WINDOW:
                        self._drain_one(pending, host_preds, host_targets)
            except RuntimeError as ex:
                self.logger.exception(ex)
        while pending:
            self._drain_one(pending, host_preds, host_targets)
        self._track_acc(acc)
        if extra_fns and host_preds:
            self.tracker.step(
                self.evaluate_host(extra_fns, host_preds, host_targets))

    def _track_acc(self, acc):
        """Fetch the device accumulator once and record phase means."""
        acc = jax.device_get(acc)
        if bool(acc["nan"]):
            raise ValueError("Loss is nan!")
        n = max(float(acc["count"]), 1.0)
        self.tracker.step({k: float(v) / n for k, v in acc["sums"].items()})

    # ------------------------------------------------------------------
    # inference-facing API (used by infer CLIs)
    # ------------------------------------------------------------------

    def predict_probs(self, image_u8: np.ndarray) -> np.ndarray:
        """Superpixel-wise foreground probability map for one RGB image."""
        h, w = image_u8.shape[:2]
        H = ((h + 31) // 32) * 32
        W = ((w + 31) // 32) * 32
        spec = CanvasSpec(H, W, n_classes=self.config.n_classes)
        from ..data.loader import place_on_canvas

        item = place_on_canvas({"image": image_u8, "pixel_mask": None,
                                "points": None, "use_mask_as_points": False},
                               spec)
        batch = {k: v[None] for k, v in item.items()}
        self._point_mode = getattr(self, "_point_mode", False)
        step = self._get_step("eval", (H, W))
        acc = steps.init_metric_acc(steps.EVAL_METRIC_KEYS)
        pred, _ = step(self.params, acc, self._put_batch(batch),
                       self._next_rng())
        return np.asarray(pred)[0, :h, :w]
