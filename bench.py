"""Benchmark: GlaS-shaped superpixel inference throughput (SLIC + VGG16 +
aggregation fused on device) vs the CPU reference pipeline.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

The reference repo publishes no numbers (BASELINE.md), so the baseline is
measured here once — a faithful CPU reproduction of the reference's
inference iteration (skimage-style CPU SLIC + torch-CPU VGG16 hypercolumn +
superpixel aggregation + MLP, cf. models/wesup.py:263-304) — and cached in
BASELINE_MEASURED.json.

All progress goes to stderr; stdout carries only the JSON line.
"""

import json
import dataclasses
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def restore_committed_cache():
    """Restore committed compile-cache entries into the live cache dir.

    The driver times ``python bench.py`` cold at the end of each round and
    /tmp is wiped between rounds, so the cache lives in /root/.cache (which
    persists) AND the serialized TPU executables for the bench's own
    programs are committed under artifacts/compile_cache/ — git is the only
    storage *guaranteed* to persist (VERDICT r4 #1; BENCH_r04 compile_s
    186.5 was 97% avoidable compile tax).  Copy any committed entry the
    live dir is missing before jax first consults it.
    """
    src = REPO / "artifacts" / "compile_cache"
    dst = Path(os.environ["JAX_COMPILATION_CACHE_DIR"])
    if not src.is_dir():
        return
    dst.mkdir(parents=True, exist_ok=True)
    restored = 0
    for entry in src.iterdir():
        target = dst / entry.name
        if entry.is_file() and not target.exists():
            import shutil

            shutil.copy2(entry, target)
            restored += 1
    if restored:
        log(f"[cache] restored {restored} committed entries -> {dst}")


def publish_cache_entries(since: float):
    """Copy this bench's compiled programs into artifacts/compile_cache/.

    Run (via ``bench.py --warmup``) after the last compute-path change of a
    round; commit the result so the next round's driver bench pays cache
    hits even if every scratch directory is gone.  Only entries the warmup
    itself read or wrote (atime/mtime >= ``since``) are published, and stale
    committed entries for superseded program hashes are dropped, so the
    committed set stays exactly the live bench's programs.
    """
    src = Path(os.environ["JAX_COMPILATION_CACHE_DIR"])
    dst = REPO / "artifacts" / "compile_cache"
    dst.mkdir(parents=True, exist_ok=True)
    import shutil

    committed = {e.name for e in dst.glob("jit_repeat_steps-*-cache")}
    # freshly written entries (cache misses during this warmup) are the
    # authoritative live set: when the benched program re-keys, the stale
    # committed entries must NOT be carried forward (they cost git bytes
    # and restore time forever).  Only when the warmup wrote nothing at
    # all (pure cache hit — program unchanged since last publish) is the
    # committed set kept as-is.
    fresh = {e.name: e for e in src.glob("jit_repeat_steps-*-cache")
             if e.stat().st_mtime >= since}
    keep = fresh if fresh else {
        e.name: e for e in src.glob("jit_repeat_steps-*-cache")
        if e.name in committed}
    dropped = 0
    for old in dst.glob("jit_repeat_steps-*-cache"):
        if old.name not in keep:
            old.unlink()
            dropped += 1
    for entry in keep.values():
        shutil.copy2(entry, dst / entry.name)
    log(f"[cache] published {len(keep)} bench program entries "
        f"(dropped {dropped} no-longer-live) -> {dst} "
        "(git add + commit to persist across rounds)")

# GlaS images are 775x522; the train/eval protocol rescales by 0.5
# (models/wesup.py:146) -> 261x388 content on a 288x416 canvas
GLAS_HW = (261, 388)
CANVAS = (288, 416)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_images(batch, seed=0):
    rng = np.random.default_rng(seed)
    H, W = CANVAS
    h, w = GLAS_HW
    imgs = np.clip(rng.normal(200, 25, (batch, H, W, 3)), 0, 255).astype(np.uint8)
    valid = np.zeros((batch, H, W), bool)
    valid[:, :h, :w] = True
    return imgs, valid


# ---------------------------------------------------------------------------
# CPU reference baseline (measured once, cached)
# ---------------------------------------------------------------------------

def _cpu_slic_once(img_f, sp_area=200, compactness=40.0, iters=10):
    """Vectorized numpy SLIC matching the skimage call in the reference
    preprocess (models/wesup.py:471-476); stands in for skimage's Cython SLIC
    (not installed here). numpy is, if anything, FASTER than single-image
    Cython SLIC for the update steps, so the baseline is not understated."""
    h, w = img_f.shape[:2]
    step = (sp_area) ** 0.5
    kh, kw = max(1, round(h / step)), max(1, round(w / step))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    feat = np.concatenate([img_f * 255.0, yy[..., None], xx[..., None]], -1)
    cy = np.minimum((yy / (h / kh)).astype(int), kh - 1)
    cx = np.minimum((xx / (w / kw)).astype(int), kw - 1)
    cell = cy * kw + cx
    K = kh * kw
    centers = np.stack([feat.reshape(-1, 5)[cell.reshape(-1) == k].mean(0)
                        for k in range(K)])
    scale = np.array([1, 1, 1, compactness / step, compactness / step],
                     np.float32)
    for _ in range(iters):
        best_d = np.full((h, w), np.inf, np.float32)
        seg = np.zeros((h, w), np.int64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny = np.clip(cy + dy, 0, kh - 1)
                nx = np.clip(cx + dx, 0, kw - 1)
                cand = ny * kw + nx
                d = (((feat - centers[cand]) * scale) ** 2).sum(-1)
                take = d < best_d
                best_d[take] = d[take]
                seg[take] = cand[take]
        sums = np.zeros((K, 5))
        np.add.at(sums, seg.reshape(-1), feat.reshape(-1, 5))
        cnt = np.bincount(seg.reshape(-1), minlength=K)[:, None]
        centers = np.where(cnt > 0, sums / np.maximum(cnt, 1), centers)
    return seg


def measure_cpu_baseline():
    """One reference-equivalent inference iteration on CPU, images/sec."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.set_num_threads(os.cpu_count() or 1)
    h, w = GLAS_HW
    rng = np.random.default_rng(0)
    img = rng.random((h, w, 3)).astype(np.float32)

    # skimage-equivalent SLIC timing
    t0 = time.time()
    seg = _cpu_slic_once(img)
    slic_t = time.time() - t0
    log(f"[baseline] CPU SLIC: {slic_t:.2f}s ({seg.max() + 1} superpixels)")

    # torch VGG16 + side convs + per-superpixel MLP (reference forward)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch, convs = [], 3, []
    for c in cfg:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            conv = nn.Conv2d(in_ch, c, 3, padding=1)
            layers.append(conv)
            layers.append(nn.ReLU())
            convs.append(conv)
            in_ch = c
    backbone = nn.Sequential(*layers).eval()
    sides = [nn.Conv2d(c.out_channels, c.out_channels // 2, 1) for c in convs]
    fc = nn.Sequential(nn.Linear(2112, 1024), nn.ReLU(),
                       nn.Linear(1024, 1024), nn.ReLU(),
                       nn.Linear(1024, 32), nn.ReLU(),
                       nn.Linear(32, 2), nn.Softmax(dim=1)).eval()

    K = int(seg.max()) + 1
    onehot = np.zeros((K, h * w), np.float32)
    onehot[seg.reshape(-1), np.arange(h * w)] = 1.0
    sp_maps = torch.from_numpy(onehot / onehot.sum(1, keepdims=True))

    x = torch.from_numpy(img).permute(2, 0, 1)[None]
    t0 = time.time()
    with torch.no_grad():
        taps, hcur = [], x
        for layer in backbone:
            hcur = layer(hcur)
            if isinstance(layer, nn.Conv2d):
                side = sides[len(taps)](hcur)
                taps.append(F.interpolate(side, (h, w), mode="bilinear",
                                          align_corners=True))
        hyper = torch.cat(taps, 1).flatten(2).squeeze(0)
        pooled = sp_maps @ hyper.t()
        _ = fc(pooled)
    net_t = time.time() - t0
    log(f"[baseline] torch-CPU VGG16 hypercolumn forward: {net_t:.2f}s")
    return 1.0 / (slic_t + net_t)


def get_cpu_baseline():
    cache = REPO / "BASELINE_MEASURED.json"
    if cache.exists():
        data = json.loads(cache.read_text())
        log(f"[baseline] cached: {data}")
        return data["cpu_images_per_sec"]
    ips = measure_cpu_baseline()
    payload = {"cpu_images_per_sec": ips,
               "what": "reference-equivalent CPU inference (SLIC + VGG16 "
                       "hypercolumn + superpixel MLP) at GlaS 0.5 scale",
               "host": os.uname().nodename, "cpus": os.cpu_count()}
    cache.write_text(json.dumps(payload, indent=2))
    log(f"[baseline] measured {ips:.4f} img/s, cached to {cache}")
    return ips


# ---------------------------------------------------------------------------
# TPU measurement
# ---------------------------------------------------------------------------

def measure_tpu(warmup_only: bool = False):
    import jax
    import jax.numpy as jnp

    from wesup_tpu.config import WESUPConfig
    from wesup_tpu.models import wesup
    from wesup_tpu.models.steps import make_predict_step

    log(f"[tpu] devices: {jax.devices()}")
    config = WESUPConfig()
    if os.environ.get("WESUP_BENCH_POOLING"):  # A/B hook: adjoint | local | fullres
        config = dataclasses.replace(
            config, pooling=os.environ["WESUP_BENCH_POOLING"])
    params = wesup.init_params(jax.random.PRNGKey(0))
    step = make_predict_step(config, CANVAS, mode="superpixel")

    # Timing through the axon tunnel is treacherous: block_until_ready has
    # been observed returning immediately on pending results, the terminal
    # memoizes repeated (executable, inputs) pairs, and every host<->device
    # round trip costs ~40 ms.  So the timed unit is an ON-DEVICE
    # lax.scan of N FULL predict steps (each iteration salts the image so
    # no work can be reused or elided), finished by one synchronous scalar
    # fetch; the per-step time is the difference quotient between two scan
    # lengths, which cancels dispatch/RPC/fetch overhead exactly.
    # ONE program for every scan length: n is a traced scalar driving a
    # fori_loop (same salting math as the static-length scan it replaces —
    # salt i wraps identically through uint8).  Each additional compiled
    # program costs a full ~8 MB serialized-executable LOAD through the
    # tunnel (~20-80 s each, PERF_NOTES items 44/48) in the driver-timed
    # run; with a dynamic n the short and long timings share one load.
    @jax.jit
    def repeat_steps(params, imgs, valid, n):
        def body(i, carry):
            out = step(params, imgs + i.astype(jnp.uint8), valid)
            return carry + jnp.mean(out)
        return jax.lax.fori_loop(0, n, body, jnp.zeros(()))

    def timed_fetch(n_steps, imgs, valid):
        t0 = time.time()
        val = float(np.asarray(repeat_steps(params, imgs, valid, n_steps)))
        dt = time.time() - t0
        assert np.isfinite(val), "non-finite predictions"
        return dt

    best = 0.0
    compile_s = 0.0
    N_SHORT, N_LONG = 2, 12
    # B=8/16 trade the headline within noise (BENCH_r04: 466 vs 463; round-5
    # check: 460 vs 463) and each batch size costs ~22-25 s of driver-visible
    # serialized-executable LOAD through the tunnel even on a full cache hit
    # (PERF_NOTES item 44: the <30 s compile_s bar is load-bound).  B=8 won
    # the round-4 headline, so it is the sole default; B=1/B=16 are opt-in.
    batches = tuple(int(b) for b in
                    os.environ.get("WESUP_BENCH_BATCHES", "8").split(","))
    for B in batches:
        imgs, valid = make_images(B)
        imgs, valid = jnp.asarray(imgs), jnp.asarray(valid)
        t0 = time.time()
        timed_fetch(N_SHORT, imgs, valid)
        c = time.time() - t0
        compile_s += c
        log(f"[tpu] B={B} first call (compile): {c:.1f}s")
        timed_fetch(N_LONG, imgs, valid)  # extra warm run (terminal settle)
        if warmup_only:
            # cache-seeding mode: this batch size's (single, dynamic-n)
            # program is now compiled into JAX_COMPILATION_CACHE_DIR
            continue
        dts = []
        for _ in range(3):
            t_short = timed_fetch(N_SHORT, imgs, valid)
            t_long = timed_fetch(N_LONG, imgs, valid)
            dts.append((t_long - t_short) / (N_LONG - N_SHORT))
        # median of the positive diff-quotients: one lucky noisy pairing
        # must not set the headline (min systematically inflates img/s)
        pos = sorted(d for d in dts if d > 0)
        dt = pos[len(pos) // 2] if pos else -1
        if dt < 5e-4:  # < 0.5 ms/step is beyond roofline for this model
            raise RuntimeError(
                f"implausible timing {dt*1e3:.3f} ms/step at B={B} — "
                "TPU terminal state suspect, rerun bench")
        ips = B / dt
        log(f"[tpu] B={B}: {dt * 1000:.1f} ms/step -> {ips:.1f} img/s "
            f"(diffquot blocks: {[f'{d*1e3:.1f}' for d in dts]})")
        best = max(best, ips)
    return best, compile_s


def measure_mesh(n_devices: int):
    """Sharded-predict throughput over an n-device DP mesh (VERDICT r4 #5).

    On this box only one real TPU chip exists, so when the live platform
    has fewer than ``n_devices`` the run forces an n-virtual-device CPU
    mesh (same mechanism as __graft_entry__.dryrun_multichip) — the number
    is then a correctness + scaling-shape check, not a speed claim.  On
    real multi-chip hardware the same code path measures ICI-scaled
    throughput: params replicated, batch sharded over 'data', XLA inserts
    the collectives.
    """
    os.environ.setdefault("XLA_FLAGS", "")
    if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] = (
            os.environ["XLA_FLAGS"]
            + f" --xla_force_host_platform_device_count={n_devices}").strip()

    # jax.devices() would initialize the pinned (single-chip) backend and
    # foreclose the CPU switch, so virtualness is decided WITHOUT touching
    # the backend: this box has one real chip, so any n>1 mesh is virtual
    # unless the caller asserts real hardware via WESUP_BENCH_MESH_REAL=1.
    virtual = n_devices > 1 and not os.environ.get("WESUP_BENCH_MESH_REAL")

    import jax

    if virtual:
        from wesup_tpu.runtime import force_platform

        force_platform("cpu")
        try:
            jax.config.update("jax_num_cpu_devices", n_devices)
        except Exception:
            pass

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from wesup_tpu.config import WESUPConfig
    from wesup_tpu.models import wesup
    from wesup_tpu.models.steps import make_predict_step

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    mesh = Mesh(np.asarray(devices).reshape(n_devices, 1), ("data", "model"))
    log(f"[mesh] {n_devices}x {devices[0].platform} mesh "
        f"{'(virtual — correctness/scaling-shape only)' if virtual else ''}")

    per_dev_B = int(os.environ.get("WESUP_BENCH_MESH_B", "8" if not virtual
                                   else "1"))
    B = per_dev_B * n_devices
    config = WESUPConfig() if not virtual else WESUPConfig(
        slic_iters=2, compute_dtype="float32")
    params = wesup.init_params(jax.random.PRNGKey(0))
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    params = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), rep),
                          params)
    step = make_predict_step(config, CANVAS, mode="superpixel")

    imgs, valid = make_images(B)
    imgs = jax.device_put(jnp.asarray(imgs), bsh)
    valid = jax.device_put(jnp.asarray(valid), bsh)

    from functools import partial

    @partial(jax.jit, static_argnames="n")
    def repeat_steps(params, imgs, valid, n):
        def body(carry, salt):
            out = step(params, imgs + salt, valid)
            return carry + jnp.mean(out), None
        total, _ = jax.lax.scan(
            body, jnp.zeros(()), jnp.arange(n, dtype=jnp.uint8))
        return total

    def timed_fetch(n_steps):
        t0 = time.time()
        val = float(np.asarray(repeat_steps(params, imgs, valid, n_steps)))
        dt = time.time() - t0
        assert np.isfinite(val), "non-finite predictions on the mesh"
        return dt

    N_SHORT, N_LONG = (2, 12) if not virtual else (1, 3)
    t0 = time.time()
    timed_fetch(N_SHORT)
    log(f"[mesh] first call (compile): {time.time() - t0:.1f}s")
    timed_fetch(N_LONG)
    dts = []
    for _ in range(3):
        dts.append((timed_fetch(N_LONG) - timed_fetch(N_SHORT))
                   / (N_LONG - N_SHORT))
    pos = sorted(d for d in dts if d > 0)
    dt = pos[len(pos) // 2] if pos else float("nan")
    ips = B / dt
    log(f"[mesh] B={B} ({per_dev_B}/dev): {dt * 1000:.1f} ms/step "
        f"-> {ips:.1f} img/s")
    print(json.dumps({
        "metric": f"GlaS 0.5x superpixel inference, {n_devices}-device "
                  f"DP mesh ({'virtual CPU' if virtual else 'TPU'})",
        "value": round(ips, 2), "unit": "images/sec",
        "devices": n_devices, "per_device_batch": per_dev_B,
        "virtual_mesh": virtual,
    }))


def warmup():
    """Pre-seed the persistent cache with every program the timed bench runs.

    The driver times ``python bench.py`` cold at the end of each round; any
    round that touched the benched model re-pays the full remote Mosaic/XLA
    build (~90 s) inside that window (BENCH_r03 compile_s 91.8).  Running
    ``python bench.py --warmup`` once after the last model change moves that
    build out-of-band: the driver's run then loads serialized executables
    from the persistent cache (~seconds per program).  The entries are also
    published to artifacts/compile_cache/ for committing (git survives even
    a full scratch wipe; /tmp provably does not — BENCH_r04 compile_s 186.5).
    """
    t0 = time.time()
    _, compile_s = measure_tpu(warmup_only=True)
    log(f"[warmup] all bench programs compiled in {time.time() - t0:.1f}s "
        f"(first-call total {compile_s:.1f}s) -> cache at "
        f"{os.environ['JAX_COMPILATION_CACHE_DIR']}")
    publish_cache_entries(since=t0)


def measure_train_step():
    """Optional: full weak-label train-step throughput (stderr only)."""
    import jax
    import jax.numpy as jnp

    from wesup_tpu.config import WESUPConfig
    from wesup_tpu.models import steps as steps_mod
    from wesup_tpu.models import wesup

    H, W, B, P = 224, 320, 1, 256
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8)),
        "valid": jnp.ones((B, H, W), bool),
        "pixel_mask": jnp.asarray(rng.integers(0, 2, (B, H, W)).astype(np.int32)),
        "points": jnp.zeros((B, P, 3), jnp.int32),
        "point_valid": jnp.zeros((B, P), bool),
        "use_mask_as_points": jnp.zeros((B,), bool),
        "sample_valid": jnp.ones((B,), bool),
    }
    cfg = WESUPConfig()
    if os.environ.get("WESUP_BENCH_POOLING"):  # A/B hook: adjoint | local | fullres
        cfg = dataclasses.replace(cfg, pooling=os.environ["WESUP_BENCH_POOLING"])
    params = wesup.init_params(jax.random.PRNGKey(0))
    tx = steps_mod.make_optimizer(cfg)
    opt = tx.init(params)
    step = steps_mod.make_train_step(cfg, (H, W), point_mode=True, tx=tx)
    acc = steps_mod.init_metric_acc()
    key = jax.random.PRNGKey(0)
    p, o, a = step(params, opt, acc, batch, key)
    jax.block_until_ready(a["count"])
    n = 20
    t0 = time.time()
    for _ in range(n):
        p, o, a = step(p, o, a, batch, key)
    jax.block_until_ready(a["count"])
    dt = (time.time() - t0) / n
    log(f"[tpu] train step (aug+SLIC+fwd+bwd+SGD, B=1 {H}x{W}): "
        f"{dt * 1000:.1f} ms -> {1 / dt:.1f} img/s")


def main():
    # The axon tunnel occasionally wedges hard: PJRT client init blocks
    # forever inside native code (observed 2026-08-17, >2 h), which would
    # hang this process with no output.  Bound the run: after
    # WESUP_BENCH_TIMEOUT seconds (default 25 min — a cache-miss compile
    # is ~8 min, so this only fires on a genuine wedge) abort with a
    # diagnostic on stderr and a nonzero exit so the caller can retry.
    import threading

    def _watchdog():
        log(f"[bench] watchdog: no result after {timeout_s:.0f}s — "
            "TPU tunnel presumed wedged (PJRT init or RPC stuck); aborting")
        os._exit(1)

    timeout_s = float(os.environ.get("WESUP_BENCH_TIMEOUT", 1500))
    timer = threading.Timer(timeout_s, _watchdog)
    timer.daemon = True
    timer.start()

    restore_committed_cache()

    if "--warmup" in sys.argv:
        warmup()
        timer.cancel()
        return

    if "--mesh" in sys.argv:
        n = int(sys.argv[sys.argv.index("--mesh") + 1])
        measure_mesh(n)
        timer.cancel()
        return

    baseline = get_cpu_baseline()
    ours, compile_s = measure_tpu()
    if os.environ.get("WESUP_BENCH_TRAIN"):
        # still under the watchdog: the tunnel can wedge here too
        measure_train_step()
    timer.cancel()
    result = {
        "metric": "GlaS 0.5x superpixel inference (SLIC+VGG16+aggregation fused)",
        "value": round(ours, 2),
        "unit": "images/sec",
        "vs_baseline": round(ours / baseline, 1),
        # first-call time, all batch programs summed: ~seconds when the
        # persistent cache (/root/.cache/jax_comp_cache, restored from
        # artifacts/compile_cache/) is warm, minutes only if this round
        # changed the benched program (PERF_NOTES item 18)
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
