"""Profile the full jitted train or predict step on the TPU, per-op table.

Builds the production step at a given canvas/batch, traces a few steps with
``jax.profiler``, and aggregates device time per op via profile_ops.op_table
— the tool behind PERF_NOTES' "where the time goes" tables.

Train mode (default): augment + SLIC + forward + loss + backward + SGD +
metrics.  ``WESUP_PROF_MODE=predict`` profiles the superpixel inference
step instead (SLIC + forward + paint); ``WESUP_PROF_MODE=pixel`` profiles
the pixel-wise inference step (hypercolumn + per-pixel MLP, the CRAG
whole-slide protocol's unit of work — reference models/wesup.py:382-400).
``WESUP_PROF_SCAN=1`` prints a tunnel-proof salted-scan wall time instead
of a trace.

Usage:
    [WESUP_PROF_MODE=predict] python scripts/profile_train_step.py [B] [H] [W] [top_n]
"""

import dataclasses
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


def make_batch(B, H, W, seed=0):
    rng = np.random.default_rng(seed)
    P = 256
    # ~8 valid points per image so the labeled/propagation paths do real work
    points = np.zeros((B, P, 3), np.int32)
    points[..., 0] = rng.integers(0, W, (B, P))
    points[..., 1] = rng.integers(0, H, (B, P))
    points[..., 2] = rng.integers(0, 2, (B, P))
    point_valid = np.zeros((B, P), bool)
    point_valid[:, :8] = True
    return {
        "image": rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8),
        "valid": np.ones((B, H, W), bool),
        "pixel_mask": rng.integers(0, 2, (B, H, W)).astype(np.int32),
        "points": points,
        "point_valid": point_valid,
        "use_mask_as_points": np.zeros((B,), bool),
        "sample_valid": np.ones((B,), bool),
    }


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 288
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 416
    top_n = int(sys.argv[4]) if len(sys.argv) > 4 else 40

    import jax

    from wesup_tpu import runtime

    # sitecustomize force-pins jax_platforms to the TPU tunnel; honor an
    # explicit override (e.g. WESUP_PROF_PLATFORM=cpu for a smoke run)
    if os.environ.get("WESUP_PROF_PLATFORM"):
        runtime.force_platform(os.environ["WESUP_PROF_PLATFORM"])

    import jax.numpy as jnp

    from profile_ops import op_table
    from wesup_tpu.config import WESUPConfig
    from wesup_tpu.models import steps as steps_mod
    from wesup_tpu.models import wesup

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = WESUPConfig()
    if os.environ.get("WESUP_PROF_POOLING"):  # A/B hook: adjoint | local | fullres
        cfg = dataclasses.replace(cfg, pooling=os.environ["WESUP_PROF_POOLING"])
    params = wesup.init_params(jax.random.PRNGKey(0))
    mode = os.environ.get("WESUP_PROF_MODE", "train")
    key = jax.random.PRNGKey(0)
    batch = {k: jnp.asarray(v) for k, v in make_batch(B, H, W).items()}

    if mode in ("predict", "pixel"):
        pstep = steps_mod.make_predict_step(
            cfg, (H, W), mode="superpixel" if mode == "predict" else "pixel")
        image, valid = batch["image"], batch["valid"]

        t0 = time.time()
        pred = pstep(params, image, valid)
        jax.block_until_ready(pred)
        print(f"first call: {time.time() - t0:.1f}s", file=sys.stderr)

        if os.environ.get("WESUP_PROF_SCAN"):
            import functools

            @functools.partial(jax.jit, static_argnames="n")
            def repeat(params, image, valid, n):
                def body(carry, salt):
                    p = pstep(params, image + salt, valid)
                    return carry + jnp.sum(p).astype(jnp.float32), None
                out, _ = jax.lax.scan(
                    body, jnp.float32(0.0), jnp.arange(n, dtype=jnp.uint8))
                return out

            def fetch(n):
                t0 = time.time()
                np.asarray(repeat(params, image, valid, n))
                return time.time() - t0

            for n in (2, 8):
                t0 = time.time()
                fetch(n)
                print(f"scan n={n} compile: {time.time() - t0:.1f}s",
                      file=sys.stderr)
            dts = sorted((fetch(8) - fetch(2)) / 6.0 for _ in range(3))
            dt = dts[1]
            print(f"SCAN-TIMED {mode} step: {dt * 1e3:.1f} ms/step -> "
                  f"{B / dt:.1f} img/s "
                  f"(blocks {[f'{d*1e3:.1f}' for d in dts]})")
            return

        n_traced = int(os.environ.get("WESUP_PROF_STEPS", "2"))
        logdir = f"/tmp/wesup_prof_{mode}"
        with jax.profiler.trace(logdir):
            for _ in range(n_traced):
                pred = pstep(params, image, valid)
            jax.block_until_ready(pred)
        totals = op_table(logdir)
        grand = sum(totals.values())
        print(f"{mode.upper()} B={B} {H}x{W}: device total "
              f"{grand / 1e9 / n_traced:.2f} ms/step ({len(totals)} ops)")
        for name, ps in totals.most_common(top_n):
            print(f"{ps / 1e9 / n_traced:8.3f} ms  "
                  f"{100.0 * ps / grand:5.1f}%  {name[:120]}")
        return

    tx = steps_mod.make_optimizer(cfg)
    opt = tx.init(params)
    step = steps_mod.make_train_step(cfg, (H, W), point_mode=True, tx=tx)
    acc = steps_mod.init_metric_acc()

    t0 = time.time()
    params, opt, acc = step(params, opt, acc, batch, key)
    jax.block_until_ready(acc["count"])
    print(f"first call: {time.time() - t0:.1f}s", file=sys.stderr)

    if os.environ.get("WESUP_PROF_SCAN"):
        # tunnel-proof wall timing: an on-device lax.scan of N full train
        # steps (salted batches so nothing can be reused), one scalar fetch;
        # ms/step is the diff quotient between two scan lengths (the same
        # scheme bench.py uses — the terminal memoizes repeated plain calls)
        import functools

        import jax.numpy as jnp_

        @functools.partial(jax.jit, static_argnames="n")
        def repeat(params, opt, acc, batch, n):
            def body(carry, salt):
                p, o, a = carry
                b = dict(batch, image=batch["image"] + salt)
                p, o, a = step(p, o, a, b, jax.random.fold_in(key, salt))
                return (p, o, a), None
            (p, o, a), _ = jax.lax.scan(
                body, (params, opt, acc),
                jnp_.arange(n, dtype=jnp_.uint8))
            # depend on params AND metrics so nothing is dead-code-eliminated
            return (a["sums"]["loss"] + a["count"]
                    + jnp_.sum(p["cls"]["w"]).astype(jnp_.float32))

        def fetch(n):
            t0 = time.time()
            np.asarray(repeat(params, opt, acc, batch, n))
            return time.time() - t0

        for n in (2, 8):
            t0 = time.time()
            fetch(n)
            print(f"scan n={n} compile: {time.time() - t0:.1f}s",
                  file=sys.stderr)
        dts = sorted((fetch(8) - fetch(2)) / 6.0 for _ in range(3))
        dt = dts[1]
        print(f"SCAN-TIMED train step: {dt * 1e3:.1f} ms/step -> "
              f"{B / dt:.1f} img/s (blocks {[f'{d*1e3:.1f}' for d in dts]})")
        return

    n_steps = 5
    logdir = "/tmp/wesup_prof_train"
    # timed (untraced) loop for the wall-clock number
    t0 = time.time()
    for _ in range(n_steps):
        params, opt, acc = step(params, opt, acc, batch, key)
    jax.block_until_ready(acc["count"])
    dt = (time.time() - t0) / n_steps
    print(f"steady wall: {dt * 1e3:.1f} ms/step -> {B / dt:.1f} img/s",
          file=sys.stderr)

    n_traced = int(os.environ.get("WESUP_PROF_STEPS", "2"))
    with jax.profiler.trace(logdir):
        for _ in range(n_traced):
            params, opt, acc = step(params, opt, acc, batch, key)
        jax.block_until_ready(acc["count"])
    print(f"trace collected ({time.time() - t0:.0f}s total)", file=sys.stderr)

    totals = op_table(logdir)
    grand = sum(totals.values())
    print(f"B={B} {H}x{W}: device total {grand / 1e9 / n_traced:.2f} ms/step "
          f"({len(totals)} ops)")
    for name, ps in totals.most_common(top_n):
        print(f"{ps / 1e9 / n_traced:8.3f} ms  {100.0 * ps / grand:5.1f}%  "
              f"{name[:120]}")


if __name__ == "__main__":
    main()
