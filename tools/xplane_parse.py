"""Minimal XSpace (xplane.pb) parser: per-op device-time attribution.

The image ships no tensorboard xplane converter that works, so this decodes
the protobuf wire format directly (schema: tsl/profiler/protobuf/xplane.proto)
and prints the top HLO ops by total duration on the device plane.

Usage: python tools/xplane_parse.py <trace.xplane.pb> [top_n]
"""
import struct
import sys
from collections import defaultdict


def read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf, start=0, end=None):
    pos = start
    end = len(buf) if end is None else end
    while pos < end:
        tag, pos = read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = read_varint(buf, pos)
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_event(buf):
    mid = dur = 0
    occurrences = 1
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1:
            mid = val
        elif fnum == 3:
            dur = val
        elif fnum == 5:
            occurrences = val
    return mid, dur, occurrences


def parse_line(buf):
    name = b""
    events = []
    for fnum, wt, val in iter_fields(buf):
        if fnum == 2:
            name = val
        elif fnum in (4, 6) and wt == 2:
            # some writers emit events at field 4, others at 6
            ev = parse_event(val)
            if ev[0] or ev[1]:
                events.append(ev)
    return name.decode("utf-8", "replace"), events


def parse_meta_entry(buf):
    """map<int64, XEventMetadata> entry."""
    key = 0
    name = b""
    disp = b""
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1:
            key = val
        elif fnum == 2:
            for f2, w2, v2 in iter_fields(val):
                if f2 == 2:
                    name = v2
                elif f2 == 4:
                    disp = v2
    return key, (disp or name).decode("utf-8", "replace")


def parse_plane(buf):
    name = b""
    lines = []
    meta = {}
    for fnum, wt, val in iter_fields(buf):
        if fnum == 2:
            name = val
        elif fnum == 3:
            lines.append(parse_line(val))
        elif fnum == 4:
            k, v = parse_meta_entry(val)
            meta[k] = v
    return name.decode("utf-8", "replace"), lines, meta


def summarize(path, top_n=40, plane_filter="TPU"):
    data = open(path, "rb").read()
    out = []
    for fnum, wt, val in iter_fields(data):
        if fnum == 1:
            pname, lines, meta = parse_plane(val)
            if plane_filter not in pname:
                continue
            per_op = defaultdict(lambda: [0, 0])
            total = 0
            for lname, events in lines:
                for mid, dur, occ in events:
                    nm = meta.get(mid, str(mid))
                    nm = nm.split(" = ")[0].lstrip("%")
                    # collapse numbered instances: fusion.1400 -> fusion
                    base = nm.rsplit(".", 1)
                    if len(base) == 2 and base[1].isdigit():
                        nm = base[0]
                    per_op[nm][0] += dur
                    per_op[nm][1] += occ if occ > 1 else 1
                    total += dur
            out.append((pname, total, per_op))
    return out


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    for pname, total, per_op in summarize(path, top_n):
        print(f"=== plane: {pname}  total {total/1e9:.3f} ms (sum of events)")
        rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top_n]
        for nm, (dur, cnt) in rows:
            print(f"{dur/1e9:9.3f} ms  x{cnt:<6d} {nm[:110]}")


if __name__ == "__main__":
    main()
