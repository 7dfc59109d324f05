"""Minimal self-contained xplane.pb parser -> per-op time breakdown.

The tensorboard_plugin_profile converter in this image is version-broken
(generated pb2 files predate protobuf 6, and tensorflow 2.21 dropped the
pywrap symbol it calls), so this decodes the XSpace wire format directly —
no proto descriptors needed. Schema subset (tsl/profiler xplane.proto):
  XSpace.planes=1; XPlane{name=2, lines=3, event_metadata=4, stat_metadata=5}
  XLine{name=2?, events=4}; XEvent{metadata_id=1, duration_ps=3}
  event_metadata entry{key=1, value=2{id=1, name=2, display_name=3}}

Usage: python tools/xplane_parse.py <trace.xplane.pb|trace-dir> [--top 40]
"""


from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable uninstalled

import argparse
import collections
import glob
import os
import sys


def read_varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def iter_fields(buf):
    i = 0
    end = len(buf)
    while i < end:
        tag, i = read_varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = read_varint(buf, i)
            yield fn, wt, v
        elif wt == 2:
            ln, i = read_varint(buf, i)
            yield fn, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:
            yield fn, wt, buf[i : i + 4]
            i += 4
        elif wt == 1:
            yield fn, wt, buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"bad wiretype {wt} at field {fn}")


def parse_device_ops(path: str, line_name: bytes = b"XLA Ops"):
    """-> (op_name -> [count, total_ps]) for the TPU device plane."""
    data = open(path, "rb").read()
    for _, _, plane in (f for f in iter_fields(data) if f[0] == 1):
        name = None
        meta = {}
        lines = []
        for fn, wt, v in iter_fields(plane):
            if fn == 2 and wt == 2:
                name = v
            elif fn == 4 and wt == 2:
                mid, mname = None, b""
                for f2, w2, v2 in iter_fields(v):
                    if f2 == 1 and w2 == 0:
                        mid = v2
                    elif f2 == 2 and w2 == 2:
                        for f3, w3, v3 in iter_fields(v2):
                            if f3 == 1 and w3 == 0:
                                mid = v3
                            elif f3 == 2 and w3 == 2:
                                mname = v3
                if mid is not None:
                    meta[mid] = mname.decode(errors="replace")
            elif fn == 3 and wt == 2:
                lines.append(v)
        if name is None or not name.startswith(b"/device:TPU"):
            continue
        agg = collections.defaultdict(lambda: [0, 0])
        for line in lines:
            lname = None
            events = []
            for fn, wt, v in iter_fields(line):
                if fn == 2 and wt == 2:
                    lname = v
                elif fn == 4 and wt == 2:
                    events.append(v)
            if lname != line_name:
                continue
            parsed = []
            for ev in events:
                mid, off, dur = None, 0, 0
                for fn, wt, v in iter_fields(ev):
                    if fn == 1 and wt == 0:
                        mid = v
                    elif fn == 2 and wt == 0:
                        off = v
                    elif fn == 3 and wt == 0:
                        dur = v
                parsed.append((off, dur, meta.get(mid, f"#{mid}")))
            # EXCLUSIVE (self) time: while/cond/call ops are emitted as
            # events spanning their body ops on the SAME line, so naive
            # duration sums double-count every nested region (a 5-step
            # sampler trace read 2.2s "total" for ~1.2s of device time).
            # Stack-walk the interval nesting: each event is charged its
            # duration, and that duration is subtracted from its
            # immediate parent's self time.
            parsed.sort(key=lambda e: (e[0], -e[1]))
            stack = []  # end_ps of currently-open intervals, with names
            for off, dur, name in parsed:
                while stack and stack[-1][0] <= off:
                    stack.pop()
                a = agg[name]
                a[0] += 1
                a[1] += dur
                if stack:
                    agg[stack[-1][1]][1] -= dur
                stack.append((off + dur, name))
        return dict(agg)
    return {}


def group_key(op_name: str) -> str:
    """Collapse XLA op instance names (fusion.123, %dot.4) to families."""
    name = op_name.lstrip("%").split(" ")[0]
    return name.split(".")[0]


def summarize(path: str, top: int = 40, iters: int | None = None,
              line: str = "XLA Ops"):
    ops = parse_device_ops(path, line_name=line.encode())
    total_ps = sum(v[1] for v in ops.values())
    rows = sorted(ops.items(), key=lambda kv: -kv[1][1])
    fam = collections.defaultdict(lambda: [0, 0])
    for k, (n, ps) in ops.items():
        f = fam[group_key(k)]
        f[0] += n
        f[1] += ps
    out = []
    out.append(f"total device op time: {total_ps/1e9:.2f} ms")
    out.append("\n== by op family ==")
    for k, (n, ps) in sorted(fam.items(), key=lambda kv: -kv[1][1])[:top]:
        out.append(f"{ps/1e9:9.2f} ms  {100*ps/max(total_ps,1):5.1f}%  x{n:<6} {k}")
    out.append("\n== top individual ops ==")
    for k, (n, ps) in rows[:top]:
        out.append(f"{ps/1e9:9.2f} ms  {100*ps/max(total_ps,1):5.1f}%  x{n:<6} {k[:100]}")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line", default="XLA Ops",
                    help='xplane line to aggregate, e.g. "XLA Modules" '
                         "for per-executable totals")
    args = ap.parse_args()
    path = args.path
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "**/*.xplane.pb"), recursive=True)
        if not cands:
            sys.exit(f"no xplane.pb under {path}")
        path = max(cands, key=os.path.getmtime)
        print("parsing:", path, file=sys.stderr)
    print(summarize(path, args.top, line=args.line))


if __name__ == "__main__":
    main()
