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


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
                "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2,
                "u16": 2}
_SHAPE_RE = re.compile(r"\b(f32|bf16|f16|f64|s64|s32|s16|s8|u64|u32|u16|u8|"
                       r"pred)\[([0-9,]*)\]")


def _hlo_bytes(instr: str) -> int:
    """HBM traffic lower bound for one HLO instruction: the byte size of
    every top-level shape in the instruction text (its output(s) + each
    operand it reads).  Fusion temporaries never appear — they stay
    internal — so this is exactly the tensor set that must cross HBM at
    least once."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(instr):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def roofline(xs, top=20, hbm_gbps=819.0):
    """Per-op memory-roofline table: measured time vs bytes/bandwidth
    lower bound, aggregated over the traced window.  The aggregate
    bound is the floor any schedule must respect if every listed tensor
    crosses HBM once at full bandwidth (compute ignored — see the
    analytic MXU table in tools/probe_rn50_224.py for the FLOP side)."""
    for plane in xs.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        print(f"=== {plane.name} ===")
        steps = 1
        for line in plane.lines:
            if line.name == "Steps" and line.events:
                steps = len(line.events)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = {}
            for ev in line.events:
                md = plane.event_metadata.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                dur, byt, cnt = agg.get(name, (0, 0, 0))
                agg[name] = (ev.duration_ps + dur, _hlo_bytes(name), cnt + 1)
            t_meas = sum(d for d, _, _ in agg.values())
            t_bound = sum(b * c / (hbm_gbps * 1e9) * 1e12
                          for _, b, c in agg.values())
            print(f"steps: {steps}; measured {t_meas / 1e9 / steps:.2f} "
                  f"ms/step; HBM-roofline floor "
                  f"{t_bound / 1e9 / steps:.2f} ms/step "
                  f"(= {t_meas / max(t_bound, 1):.2f}x above)")
            if t_bound > t_meas:
                print("NOTE: summed floor exceeds measured time — XLA "
                      "aliased/elided some listed operands (common for "
                      "pad/concat/DUS-heavy graphs), so the AGGREGATE "
                      "floor is not a valid bound here; per-op rows with "
                      "real traffic still are.")
            rows = []
            for name, (dur, byt, cnt) in agg.items():
                bound = byt * cnt / (hbm_gbps * 1e9) * 1e12
                rows.append((dur - bound, dur, bound, byt, cnt, name))
            print(f"{'ms/step':>9s} {'floor':>7s} {'GB/s':>6s} x  op")
            for gap, dur, bound, byt, cnt, name in sorted(rows)[::-1][:top]:
                eff = byt * cnt / (dur / 1e12) / 1e9 if dur else 0.0
                print(f"{dur / 1e9 / steps:9.3f} {bound / 1e9 / steps:7.3f} "
                      f"{eff:6.0f} {cnt // steps:2d}  {name[:90]}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("trace", help="profile dir or .xplane.pb file")
    parser.add_argument("--top", type=int, default=20)
    parser.add_argument("--by", choices=["category", "op", "roofline"],
                        default="category")
    parser.add_argument("--hbm_gbps", type=float, default=819.0)
    args = parser.parse_args(argv)
    xs = load_xspace(find_xplane(args.trace))
    if args.by == "roofline":
        roofline(xs, args.top, args.hbm_gbps)
    else:
        summarize(xs, args.top, args.by)


if __name__ == "__main__":
    main()
