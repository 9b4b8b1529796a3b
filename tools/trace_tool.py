"""Parse a jax.profiler xplane trace: per-plane / per-line / per-op time.

Usage: python tools/trace_tool.py <trace_dir_or_xplane.pb> [--ops N]
"""

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def load(path):
    if os.path.isdir(path):
        files = glob.glob(os.path.join(path, "**/*.xplane.pb"), recursive=True)
        path = max(files, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(xs, top_ops=25):
    for p in xs.planes:
        names = {m.id: m.name for m in p.event_metadata.values()}
        # Per-op source attribution: event metadata carries stats
        # (tf_op / source info) keyed through plane stat_metadata.
        stat_names = {m.id: m.name for m in p.stat_metadata.values()}
        op_src = {}
        for m in p.event_metadata.values():
            parts = []
            for s in m.stats:
                k = stat_names.get(s.metadata_id, "")
                if k in ("tf_op", "source", "source_info", "equation"):
                    # XStat value is a oneof: str refs go through
                    # ref_value (an id into stat_metadata), literals
                    # through str_value.
                    if s.WhichOneof("value") == "ref_value":
                        val = stat_names.get(s.ref_value, "")
                    elif s.WhichOneof("value") == "str_value":
                        val = s.str_value
                    else:
                        val = ""
                    if val:
                        parts.append(f"{k}={val}")
            if parts:
                op_src[m.name] = " ".join(parts)
        total = 0
        per_line = []
        op_time = defaultdict(int)
        op_count = defaultdict(int)
        for l in p.lines:
            lt = sum(e.duration_ps for e in l.events)
            per_line.append((l.name, lt, len(l.events)))
            total += lt
            for e in l.events:
                op_time[names.get(e.metadata_id, "?")] += e.duration_ps
                op_count[names.get(e.metadata_id, "?")] += 1
        if total == 0:
            continue
        print(f"\n=== plane {p.name}: {total/1e9:.3f} ms across "
              f"{len(p.lines)} lines ===")
        for name, lt, n in sorted(per_line, key=lambda x: -x[1])[:6]:
            print(f"  line {name[:50]:50s} {lt/1e9:10.3f} ms  {n:6d} ev")
        print("  top ops:")
        for name, t in sorted(op_time.items(), key=lambda x: -x[1])[:top_ops]:
            src = op_src.get(name, "")
            print(f"    {name[:70]:70s} {t/1e9:10.3f} ms x{op_count[name]}"
                  + (f"\n        [{src[:100]}]" if src else ""))


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/assoc_trace"
    n = int(sys.argv[sys.argv.index("--ops") + 1]) if "--ops" in sys.argv else 25
    summarize(load(path), n)
