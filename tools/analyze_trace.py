#!/usr/bin/env python3
"""Summarize a jax.profiler device trace (xplane.pb) without tensorboard.

The tensorboard profile plugin's converter is broken in this environment
(protobuf/pywrap version skew), so this parses the xplane directly:

    python tools/analyze_trace.py /path/to/profile_dir [--top 20] [--by op|category]

``profile_dir`` is what you passed to ``--profile_dir`` /
``jax.profiler.start_trace`` (the tool finds ``plugins/profile/*/... .xplane.pb files``).
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys


def find_xplane(path):
    if os.path.isfile(path):
        return path
    candidates = glob.glob(
        os.path.join(path, "plugins", "profile", "*", "*.xplane.pb")
    ) or glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
    if not candidates:
        raise SystemExit(f"No .xplane.pb found under {path}")
    return sorted(candidates)[-1]


def load_xspace(path):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(xs, top=20, by="category"):
    for plane in xs.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        print(f"=== {plane.name} ===")
        for line in plane.lines:
            if line.name == "Steps":
                durs = [ev.duration_ps for ev in line.events]
                if durs:
                    avg = sum(durs) / len(durs) / 1e9
                    print(f"steps: {len(durs)}, avg {avg:.3f} ms/step")
            if line.name != "XLA Ops":
                continue
            agg = {}
            for ev in line.events:
                md = plane.event_metadata.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                if by == "category":
                    m = re.match(r"%?([a-zA-Z\-_]+)", name)
                    key = m.group(1) if m else name[:40]
                else:
                    key = name[:100]
                agg[key] = agg.get(key, 0) + ev.duration_ps
            total = sum(agg.values()) or 1
            print(f"XLA ops total: {total / 1e9:.2f} ms (traced window)")
            for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {dur / 1e9:9.3f} ms  {100 * dur / total:5.1f}%  {name}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("trace", help="profile dir or .xplane.pb file")
    parser.add_argument("--top", type=int, default=20)
    parser.add_argument("--by", choices=["category", "op"], default="category")
    args = parser.parse_args(argv)
    xs = load_xspace(find_xplane(args.trace))
    summarize(xs, args.top, args.by)


if __name__ == "__main__":
    main()
