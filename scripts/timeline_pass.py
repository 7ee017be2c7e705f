"""Per-core TIMELINE analysis of a traced pass — the round-5 profiler.

Round 4 proved op-AGGREGATE numbers (summed duration_ps per op name,
scripts/trace_pass.py) do not predict the pass wall: conditionals nest
their branch bodies (double count), async spans overlap real work, and
gaps between ops are invisible. Four aggregate-guided A/Bs were washes.

This tool walks the xplane event timeline per device line and reports:

1. NESTING-AWARE SELF TIME: events form a containment forest (a
   conditional's span contains its branch custom-calls). Self time =
   duration − time covered by nested children. Summing self time per op
   name is a true wall decomposition (Σ self = union span of the line).
2. UNION OCCUPANCY + GAP LEDGER: merged busy intervals of the line vs
   the module span; every gap ≥ threshold is listed with the op that
   precedes and follows it (what was the core waiting on?).
3. PHASE SLICING: wall decomposition restricted to [t0, t1] windows so
   individual pass stages can be inspected.

Usage:
    python scripts/timeline_pass.py --trace-dir /tmp/apd_trace_r5
    python scripts/timeline_pass.py --trace-dir ... --inventory
    python scripts/timeline_pass.py --trace-dir ... --gaps-ms 0.05 --top 40
"""

import argparse
import glob
from collections import defaultdict


def load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs, path


def inventory(xs):
    for plane in xs.planes:
        print(f"plane: {plane.name!r}")
        for line in plane.lines:
            if not line.events:
                continue
            t0 = min(e.offset_ps for e in line.events)
            t1 = max(e.offset_ps + e.duration_ps for e in line.events)
            print(
                f"  line: {line.name!r:30s} events={len(line.events):6d} "
                f"span={(t1 - t0) / 1e9:10.1f} ms"
            )


def get_events(xs, plane_match, line_match):
    """[(name, start_ps, dur_ps)] for the first matching plane/line."""
    for plane in xs.planes:
        if plane_match not in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != line_match:
                continue
            evs = [
                (ev_names.get(e.metadata_id, "?"), e.offset_ps, e.duration_ps)
                for e in line.events
            ]
            evs.sort(key=lambda x: (x[1], -x[2]))
            return evs
    return []


def self_times(evs):
    """Nesting-aware self time via a containment stack sweep.

    evs sorted by (start, -dur). An event is pushed; when the next event
    starts beyond the stack top's end, pop. Child spans are subtracted
    from the parent's self time. Returns [(name, start, dur, self_dur)].
    """
    out = []
    stack = []  # indices into out
    for name, start, dur in evs:
        end = start + dur
        while stack and out[stack[-1]][1] + out[stack[-1]][2] <= start:
            stack.pop()
        if stack:
            # child: subtract from parent's self time (clip to parent span)
            pi = stack[-1]
            pname, pstart, pdur, pself = out[pi]
            pend = pstart + pdur
            overlap = max(0, min(end, pend) - start)
            out[pi] = (pname, pstart, pdur, pself - overlap)
        out.append((name, start, dur, dur))
        stack.append(len(out) - 1)
    return out


def union_intervals(evs):
    merged = []
    for _, start, dur in evs:
        end = start + dur
        if merged and start <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], end)
        else:
            merged.append([start, end])
    return merged


def report(evs, top_n, gaps_ms, t0_ms=None, t1_ms=None, csv_out=None):
    if not evs:
        print("no events")
        return
    base = evs[0][1]
    if t0_ms is not None or t1_ms is not None:
        lo = base + (t0_ms or 0) * 1e9
        hi = base + t1_ms * 1e9 if t1_ms is not None else float("inf")
        evs = [e for e in evs if e[1] >= lo and e[1] + e[2] <= hi]
        if not evs:
            print("no events in window")
            return
    st = self_times(evs)
    span0 = min(s for _, s, _, _ in st)
    span1 = max(s + d for _, s, d, _ in st)
    span = (span1 - span0) / 1e9
    merged = union_intervals(evs)
    busy = sum(b - a for a, b in merged) / 1e9
    print(f"timeline span {span:9.1f} ms   busy (union) {busy:9.1f} ms   "
          f"idle {span - busy:9.1f} ms  ({100 * (span - busy) / span:.1f}% gaps)")

    # --- self-time attribution ---
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for name, _, _, self_d in st:
        agg[name] += self_d / 1e9
        cnt[name] += 1
    print(f"\n== self-time attribution (Σ = busy time; top {top_n}) ==")
    for n, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {ms:9.2f} ms x{cnt[n]:5d}  avg {ms / cnt[n] * 1e3:7.1f} us  {n[:100]}")

    # --- gap ledger ---
    gaps = []
    for i in range(1, len(merged)):
        g = (merged[i][0] - merged[i - 1][1]) / 1e9
        if g >= gaps_ms:
            # op ending before the gap / op starting after
            before = max(
                (e for e in evs if abs(e[1] + e[2] - merged[i - 1][1]) < 1e3),
                key=lambda e: e[1] + e[2],
                default=("?", 0, 0),
            )
            after = next((e for e in evs if e[1] == merged[i][0]), ("?", 0, 0))
            gaps.append((g, (merged[i - 1][1] - span0) / 1e9, before[0], after[0]))
    gaps.sort(key=lambda x: -x[0])
    total_gap = sum(g for g, _, _, _ in gaps)
    print(f"\n== gap ledger (gaps ≥ {gaps_ms} ms: {len(gaps)}, Σ = {total_gap:.1f} ms) ==")
    for g, at, before, after in gaps[:top_n]:
        print(f"  {g:8.3f} ms @ t={at:9.1f}  after [{before[:55]}] before [{after[:55]}]")

    if csv_out:
        with open(csv_out, "w") as f:
            f.write("name,start_ms,dur_ms,self_ms\n")
            for name, s, d, sd in st:
                f.write(f"\"{name}\",{(s - span0) / 1e9:.4f},{d / 1e9:.4f},{sd / 1e9:.4f}\n")
        print(f"\nwrote {len(st)} events to {csv_out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/apd_trace_r5")
    ap.add_argument("--inventory", action="store_true")
    ap.add_argument("--plane", default="TPU")
    ap.add_argument("--line", default="XLA Ops")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--gaps-ms", type=float, default=0.05)
    ap.add_argument("--t0", type=float, default=None, help="window start ms")
    ap.add_argument("--t1", type=float, default=None, help="window end ms")
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()
    xs, path = load_xspace(args.trace_dir)
    print(f"loaded {path}")
    if args.inventory:
        inventory(xs)
        return
    evs = get_events(xs, args.plane, args.line)
    report(evs, args.top, args.gaps_ms, args.t0, args.t1, args.csv)


if __name__ == "__main__":
    main()
