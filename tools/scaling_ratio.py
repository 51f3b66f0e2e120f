#!/usr/bin/env python3
"""Round-12 scaling audit: compare per-query bench times across two
scale factors. A query whose cost grows much faster than the data
(ratio >> sf ratio, once both sides are clearly above fixed overhead)
is a scaling-bug candidate worth a plan read; the slow tier's known
floors are expected to show up and are annotated by hand in PLANS.md.

Usage: python3 tools/scaling_ratio.py <bench_small.json_line_file> <bench_big.json_line_file>
Each input file is a bench log; the LAST '{"metric"...}' line is used.
"""
import json
import re
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # play nice with | head


def load(path):
    last = None
    with open(path) as f:
        for line in f:
            m = re.search(r'\{"metric".*\}', line)
            if m:
                d = json.loads(m.group(0))
                if "queries" in d:  # the per-query record, not the tail summary
                    last = d
    if last is None:
        raise SystemExit(f"no per-query bench JSON line in {path}")
    return last


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(qb):
        if name not in qs:
            continue
        ts, tb = qs[name], qb[name]
        if ts <= 0 or tb <= 0:
            continue
        rows.append((tb / ts, ts, tb, name))
    rows.sort(reverse=True)
    print(f"{'ratio':>8} {'small_s':>8} {'big_s':>8}  query")
    for r, ts, tb, name in rows:
        # only flag queries with real work on BOTH sides (above ~0.25 s
        # of fixed per-query overhead) — ratios on overhead are noise
        flag = " <-- check" if (r > 15 and ts > 0.25 and tb > 2.0) else ""
        print(f"{r:8.1f} {ts:8.2f} {tb:8.2f}  {name}{flag}")


if __name__ == "__main__":
    main()
