#!/usr/bin/env python
"""Parse a jax.profiler xplane.pb into a per-op device-time ledger.

Ground truth for in-frame op costs on this container (CLAUDE.md): the
tensorboard converter chokes on the protobuf version, but the raw
xplane parses fine with the pure-Python protobuf implementation.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \\
           python tools/xplane_ledger.py /tmp/stressprof [top_n]
"""
import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def ledger(path, top=25):
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = collections.Counter()
        cnt = collections.Counter()
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name \
                    and "XLA" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps / 1e9   # ps -> ms
                cnt[name] += 1
        if not tot:
            continue
        print(f"== plane: {plane.name} "
              f"(total {sum(tot.values()):.2f} ms) ==")
        for name, ms in tot.most_common(top):
            print(f"{ms:9.3f} ms  x{cnt[name]:<5d} {name[:110]}")
        return
    print("no TPU plane found; planes:", [p.name for p in xs.planes])


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stressprof"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    paths = (glob.glob(os.path.join(base, "**", "*.xplane.pb"),
                       recursive=True) if os.path.isdir(base) else [base])
    ledger(sorted(paths)[-1], top)
