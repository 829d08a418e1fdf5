#!/usr/bin/env python
"""Exact per-op summary of a jax.profiler xplane trace, no TF required.

The installed tensorboard_plugin_profile converter is ABI-incompatible with
the environment's protobuf (Descriptors error) and the Chrome-trace JSON the
profiler also writes is *downsampled* (its "XLA Ops" lane carries ~40% of the
module wall in practice). This script parses the protobuf wire format of
``*.xplane.pb`` directly (the proto schema is tsl/profiler/protobuf/
xplane.proto — stable since TF 2.4) and aggregates exact event durations per
HLO category / op / source line on the device planes.

    python scripts/xplane_summary.py /tmp/v2ap_trace [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


# ---------------------------------------------------------------- wire format
def _read_varint(buf: memoryview, i: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def iter_fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over one message's bytes.

    value is: varint int for type 0, memoryview for type 2, raw int for
    fixed64/fixed32 (types 1/5).
    """
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, i = _read_varint(buf, i)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 1:
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 5:
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:  # groups unused in xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# ---------------------------------------------------------------- xplane bits
def parse_stat(buf) -> tuple[int, object]:
    mid, val = 0, None
    for f, _, v in iter_fields(buf):
        if f == 1:
            mid = v
        elif f == 2:  # double
            import struct
            val = struct.unpack("<d", v.to_bytes(8, "little"))[0]
        elif f in (3, 7):  # uint64 / ref
            val = v
        elif f == 4:  # int64 (plain varint, two's complement)
            val = v - (1 << 64) if v >= 1 << 63 else v
        elif f in (5, 6):  # str / bytes
            val = bytes(v).decode("utf-8", "replace")
    return mid, val


def parse_event(buf) -> tuple[int, int, list]:
    """-> (metadata_id, duration_ps, stats [(stat_metadata_id, value)])."""
    mid = dur = 0
    stats = []
    for f, _, v in iter_fields(buf):
        if f == 1:
            mid = v
        elif f == 3:
            dur = v
        elif f == 4:
            stats.append(parse_stat(v))
    return mid, dur, stats


def parse_map_entry(buf) -> tuple[int, memoryview]:
    k, val = 0, memoryview(b"")
    for f, _, v in iter_fields(buf):
        if f == 1:
            k = v
        elif f == 2:
            val = v
    return k, val


def parse_plane(buf) -> dict:
    name = ""
    lines = []          # [(line_name, [event bytes, ...])]
    ev_meta = {}        # id -> {"name": str, "stats": [(mid, val)]}
    stat_meta = {}      # id -> name
    for f, _, v in iter_fields(buf):
        if f == 2:
            name = bytes(v).decode()
        elif f == 3:  # XLine
            lname, events = "", []
            for lf, _, lv in iter_fields(v):
                if lf == 2:
                    lname = bytes(lv).decode()
                elif lf == 11 and not lname:
                    lname = bytes(lv).decode()
                elif lf == 4:
                    events.append(lv)
            lines.append((lname, events))
        elif f == 4:  # event_metadata map<int64, XEventMetadata>
            k, mv = parse_map_entry(v)
            m = {"name": "", "stats": []}
            for mf, _, mvv in iter_fields(mv):
                if mf == 2:
                    m["name"] = bytes(mvv).decode()
                elif mf == 5:
                    m["stats"].append(parse_stat(mvv))
            ev_meta[k] = m
        elif f == 5:  # stat_metadata map<int64, XStatMetadata>
            k, mv = parse_map_entry(v)
            for mf, _, mvv in iter_fields(mv):
                if mf == 2:
                    stat_meta[k] = bytes(mvv).decode()
    return {"name": name, "lines": lines, "event_metadata": ev_meta,
            "stat_metadata": stat_meta}


def parse_xspace(path: str) -> list[dict]:
    data = memoryview(open(path, "rb").read())
    return [parse_plane(v) for f, _, v in iter_fields(data) if f == 1]


# ---------------------------------------------------------------- aggregation
def summarize(logdir: str, top: int = 30, steps: int | None = None) -> dict:
    planes_files = sorted(glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True))
    if not planes_files:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    planes = [p for f in planes_files for p in parse_xspace(f)]
    dev = [p for p in planes if "TPU" in p["name"] or "/device:" in p["name"]]
    if not dev:
        dev = planes

    out = {}
    for plane in dev:
        em, sm = plane["event_metadata"], plane["stat_metadata"]
        stat_name = lambda mid: sm.get(mid, str(mid))
        # metadata-level stats (hlo_category, source, flops live there)
        minfo = {}
        for mid, m in em.items():
            st = {stat_name(k): v for k, v in m["stats"]}
            minfo[mid] = (m["name"], st)
        n_steps = 0
        cat = collections.Counter()
        cat_flops = collections.Counter()
        cat_bytes = collections.Counter()
        opagg = collections.Counter()
        opn = collections.Counter()
        module_ps = 0
        for lname, events in plane["lines"]:
            is_ops = "XLA Ops" in lname or lname == ""
            for ebuf in events:
                mid, dur, stats = parse_event(ebuf)
                name, st = minfo.get(mid, (str(mid), {}))
                if "XLA Modules" in lname:
                    module_ps += dur
                    n_steps += 1
                    continue
                if not is_ops:
                    continue
                est = dict(st)
                for k, v in stats:
                    est[stat_name(k)] = v
                c = est.get("hlo_category", "?")
                cat[c] += dur
                cat_flops[c] += int(est.get("model_flops", 0) or 0)
                cat_bytes[c] += int(est.get("raw_bytes_accessed", 0) or 0)
                key = (est.get("deduplicated_name") or name, c,
                       str(est.get("source", "")),
                       str(est.get("tf_op", ""))[:100])
                opagg[key] += dur
                opn[key] += 1
        if not cat:
            continue
        nsteps = steps or max(n_steps, 1)
        scale = 1e9 * nsteps  # ps -> ms, per step
        print(f"\n== plane {plane['name']}: {n_steps} module executions, "
              f"{module_ps / scale:.1f} ms/step module wall ==")
        total = sum(cat.values())
        print(f"total op time: {total / scale:.1f} ms/step")
        for c, ps in cat.most_common():
            ms = ps / scale
            tf = cat_flops[c] / nsteps / 1e12
            gb = cat_bytes[c] / nsteps / 1e9
            bw = gb / (ps / 1e12 / nsteps) if ps else 0.0
            print(f"{ms:9.2f} ms/step {tf:8.2f} TF {gb:8.2f} GB "
                  f"{bw:6.0f} GB/s  {c}")
        print(f"\n-- top {top} op groups (ms/step) --")
        for (name, c, src, tfop), ps in opagg.most_common(top):
            print(f"{ps / scale:8.2f} [{c}] x{opn[(name, c, src, tfop)] // nsteps}"
                  f" {name[:28]} {src[-48:]}\n          {tfop}")
        out[plane["name"]] = {
            "module_ms_per_step": module_ps / scale,
            "op_ms_per_step": total / scale,
            "by_category_ms": {c: ps / scale for c, ps in cat.items()},
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir", nargs="?", default="/tmp/v2ap_trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=None,
                    help="override the per-step divisor")
    args = ap.parse_args()
    summarize(args.logdir, args.top, args.steps)


if __name__ == "__main__":
    main()
