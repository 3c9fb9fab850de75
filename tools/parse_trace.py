"""Aggregate XLA op durations from a jax.profiler xplane trace."""
import collections, glob, sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
print("xplane files:", paths)
for path in paths:
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        total = collections.Counter()
        count = collections.Counter()
        plane_total = 0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name \
                    and len(plane.lines) > 1 and "XLA" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                total[name] += ev.duration_ps
                count[name] += 1
                plane_total += ev.duration_ps
        if not total:
            continue
        print(f"\n== plane {plane.name} (lines: {[l.name for l in plane.lines]}) "
              f"total {plane_total/1e12*1000:.1f} ms ==")
        for name, ps in total.most_common(40):
            print(f"  {ps/1e9:9.3f} ms  x{count[name]:<6} {name[:110]}")
