"""Rank TPU ops by self-time from a jax.profiler xplane trace.

Usage: python tools/xplane_top.py [trace_dir] [top_n]
Aggregates the device "XLA Ops" line (true self-time, not async
spans), grouping instruction instances by their base name.
"""
from __future__ import annotations

import collections
import glob
import re
import sys


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hevc_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane.pb under", trace_dir)
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.display_name or m.name
                   for m in plane.event_metadata.values()}
        st_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            total_ps = 0
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                base = re.sub(r"[.\d]+$", "", name)
                dur = ev.duration_ps
                if dur == 0:
                    for st in ev.stats:
                        if st_meta.get(st.metadata_id) == \
                                "device_duration_ps":
                            dur = st.int64_value or st.uint64_value
                tot[base] += dur
                cnt[base] += 1
                total_ps += dur
            print(f"== {plane.name} XLA Ops  total {total_ps/1e9:.2f} ms"
                  f"  ({len(line.events)} events)")
            for k, v in tot.most_common(top_n):
                print(f"{v/1e9:9.2f} ms {cnt[k]:7d}x  {k[:90]}")


if __name__ == "__main__":
    main()
