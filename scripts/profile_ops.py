"""Aggregate an xprof trace into a per-op time table (TPU hot-spot triage).

Usage: python scripts/profile_ops.py <logdir> [n_steps] [top_n]

Reads the ``*.xplane.pb`` written by ``jax.profiler.trace(logdir)``, sums
the device-plane "XLA Ops" events by op name, and prints the top ops with
ms/step (total divided by ``n_steps``, default 1).  This replaces the
tensorboard profile UI, which this box cannot run; the xplane schema is
loaded from the descriptor set that ships inside the tensorflow wheel, so
no generated protobuf modules are needed.
"""

import collections
import glob
import sys


def _xspace_class():
    from google.protobuf import (descriptor_pb2, descriptor_pool,
                                 message_factory)

    rel = ("include/tensorflow/tsl/profiler/protobuf/"
           "xplane_proto-descriptor-set.proto.bin")
    desc = []
    try:
        import tensorflow
        from pathlib import Path
        desc = glob.glob(str(Path(tensorflow.__file__).parent / rel))
    except ImportError:
        pass
    if not desc:  # fall back to a site-packages sweep (any venv layout)
        import site
        for sp in site.getsitepackages() + [site.getusersitepackages()]:
            desc = glob.glob(f"{sp}/tensorflow/{rel}")
            if desc:
                break
    if not desc:
        raise SystemExit("xplane descriptor set not found (need tensorflow)")
    ds = descriptor_pb2.FileDescriptorSet()
    with open(desc[0], "rb") as f:
        ds.ParseFromString(f.read())
    pool = descriptor_pool.DescriptorPool()
    for fd in ds.file:
        pool.Add(fd)
    return message_factory.GetMessageClass(
        pool.FindMessageTypeByName("tensorflow.profiler.XSpace"))


def op_table(logdir: str):
    """{op_name: total_ps} over all device-plane 'XLA Ops' events."""
    paths = glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb")
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    xs = _xspace_class()()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    totals = collections.Counter()
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                totals[meta.get(ev.metadata_id, "?")] += ev.duration_ps
    return totals


def main():
    logdir = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    totals = op_table(logdir)
    grand = sum(totals.values())
    print(f"total device time: {grand / 1e9 / n_steps:.2f} ms/step "
          f"({len(totals)} distinct ops)")
    for name, ps in totals.most_common(top_n):
        print(f"{ps / 1e9 / n_steps:8.3f} ms  {100.0 * ps / grand:5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
