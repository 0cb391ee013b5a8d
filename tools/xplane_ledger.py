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


ASYNC_MARKERS = ("copy-start", "copy-done", "async-start", "async-done",
                 "slice-start", "all-gather-start", "send", "recv")


def _is_async(name: str) -> bool:
    """Async-pair ops: their event duration is an IN-FLIGHT WINDOW
    (they overlap compute), not a device cost (CLAUDE.md). Classify on
    the instruction NAME (HLO names default to the opcode) — the full
    text also lists operands, whose names would false-match."""
    low = name.split(" = ")[0].lower()
    return any(m in low for m in ASYNC_MARKERS)


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
        mod_ms, mod_n = 0.0, 0
        for line in plane.lines:
            is_module_line = "Modules" in line.name
            if not is_module_line and "XLA Ops" not in line.name \
                    and "Steps" not in line.name \
                    and "XLA" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                if is_module_line or name.startswith("jit_"):
                    mod_ms += ev.duration_ps / 1e9
                    mod_n += 1
                    continue
                tot[name] += ev.duration_ps / 1e9   # ps -> ms
                cnt[name] += 1
        if not tot and not mod_n:
            continue
        sync = sum(ms for name, ms in tot.items() if not _is_async(name))
        print(f"== plane: {plane.name} ==")
        if mod_n:
            print(f"   modules: {mod_ms:.3f} ms over {mod_n} executions "
                  f"({mod_ms / mod_n:.3f} ms each) — the per-frame "
                  f"device time")
        print(f"   sync-op total: {sync:.2f} ms (async in-flight "
              f"windows excluded)")
        for name, ms in tot.most_common(top):
            tag = " [async window]" if _is_async(name) else ""
            print(f"{ms:9.3f} ms  x{cnt[name]:<5d} {name[:104]}{tag}")
        return
    print("no TPU plane found; planes:", [p.name for p in xs.planes])


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stressprof"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    paths = (glob.glob(os.path.join(base, "**", "*.xplane.pb"),
                       recursive=True) if os.path.isdir(base) else [base])
    ledger(sorted(paths)[-1], top)
