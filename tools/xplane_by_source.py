"""Rank TPU time by SOURCE LINE from a jax.profiler xplane trace.

Usage: python tools/xplane_by_source.py [trace_dir] [top_n]
Aggregates leaf XLA-op self-time (container `while` events excluded —
their duration spans the whole body) by the `source` stat of each op's
metadata, i.e. the Python file:line that traced it.
"""
from __future__ import annotations

import collections
import glob
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
        st_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        ev_names = {m.id: (m.display_name or m.name)
                    for m in plane.event_metadata.values()}
        # metadata id -> source line
        src = {}
        for m in plane.event_metadata.values():
            name = m.display_name or m.name
            s = ""
            for st in m.stats:
                if st_meta.get(st.metadata_id) == "source":
                    s = st.str_value
            src[m.id] = s or f"<{name.split('.')[0]}>"
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            total_ps = 0
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                if name.split(".")[0] in ("while", "conditional"):
                    continue          # container: spans its whole body
                dur = ev.duration_ps
                if dur == 0:
                    for st in ev.stats:
                        if st_meta.get(st.metadata_id) == \
                                "device_duration_ps":
                            dur = st.int64_value or st.uint64_value
                key = src.get(ev.metadata_id, "?")
                tot[key] += dur
                cnt[key] += 1
                total_ps += dur
            print(f"== {plane.name} leaf ops  total {total_ps/1e9:.2f}"
                  f" ms  ({len(line.events)} events)")
            for k, v in tot.most_common(top_n):
                print(f"{v/1e9:9.2f} ms {cnt[k]:7d}x  {k}")


if __name__ == "__main__":
    main()
