"""Aggregate device-plane op durations from a jax.profiler xplane trace."""
import glob
import gzip
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_r2"
files = glob.glob(path + "/**/*.xplane.pb", recursive=True)
print("trace files:", files)
for f in files:
    data = open(f, "rb").read()
    space = xplane_pb2.XSpace()
    space.ParseFromString(data)
    for plane in space.planes:
        total_events = sum(len(l.events) for l in plane.lines)
        print(f"\n=== plane: {plane.name} ({len(plane.lines)} lines, "
              f"{total_events} events) ===")
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        agg = defaultdict(lambda: [0.0, 0])
        line_span = {}
        for line in plane.lines:
            t0, t1 = None, None
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps / 1e9   # ms
                agg[name][1] += 1
                s = ev.offset_ps
                e = ev.offset_ps + ev.duration_ps
                t0 = s if t0 is None else min(t0, s)
                t1 = e if t1 is None else max(t1, e)
            if line.events:
                line_span[line.name] = (t1 - t0) / 1e9
        for name, span in line_span.items():
            print(f"  line {name}: span {span:.1f} ms, ")
        top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:int(sys.argv[2]) if len(sys.argv) > 2 else 35]
        tot = sum(v[0] for v in agg.values())
        print(f"  total summed op time {tot:.1f} ms")
        for name, (ms, n) in top:
            print(f"  {ms:9.2f} ms  n={n:5d}  {name[:90]}")
