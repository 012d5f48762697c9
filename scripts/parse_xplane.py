"""Aggregate device op time from a jax.profiler xplane trace.

tensorboard_plugin_profile's raw_to_tool_data is broken in this image
(protobuf/pywrap mismatch); parse the xplane proto directly via
tensorflow.tsl.profiler.protobuf.xplane_pb2 instead.

Usage:
    python scripts/parse_xplane.py profile_trace [--top 40] [--group]

Finds the newest *.xplane.pb under the directory, sums event durations per
op name on the device planes (TPU/TensorCore), and prints a table sorted by
total time. --group collapses XLA fusion suffixes (".N", "fusion.12" etc.)
into a readable family key.
"""

import argparse
import collections
import glob
import os
import re
import sys


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_planes(xs):
    for plane in xs.planes:
        n = plane.name.lower()
        if "tpu" in n or "tensorcore" in n or "/device:" in n:
            if "host" in n and "tpu" not in n:
                continue
            yield plane


GROUP_RE = re.compile(r"\.\d+$")


def group_key(name: str) -> str:
    # strip the %param / output qualifiers xla sometimes appends
    g = name.split(" ")[0]
    return GROUP_RE.sub("", g)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true")
    args = ap.parse_args()

    pbs = sorted(glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    if not pbs:
        sys.exit(f"no *.xplane.pb under {args.trace_dir}")
    xs = load_xspace(pbs[-1])

    totals = collections.Counter()
    counts = collections.Counter()
    async_total = 0.0
    for plane in device_planes(xs):
        ev_names = {em.id: em.name for em in plane.event_metadata.values()}
        for line in plane.lines:
            # 'XLA Ops' is the serial compute timeline; 'Async XLA Ops'
            # (DMA copies etc.) OVERLAP it and must not be summed in
            if line.name == "Async XLA Ops":
                async_total += sum(ev.duration_ps for ev in line.events) / 1e9
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # -> ms
                key = group_key(name) if args.group else name
                totals[key] += dur
                counts[key] += 1

    print(f"file: {pbs[-1]}")
    print(f"device total (XLA Ops line): {sum(totals.values()):.1f} ms; "
          f"overlapping async copies: {async_total:.1f} ms")
    print(f"{'ms':>10} {'n':>6}  name")
    for name, ms in totals.most_common(args.top):
        print(f"{ms:10.2f} {counts[name]:6d}  {name}")


if __name__ == "__main__":
    main()
