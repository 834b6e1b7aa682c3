#!/usr/bin/env python3
"""Mechanized bench gate (round-13 verdict ask #5).

Compares two BENCH_*.json artifacts on their shared queries (min-of-3
values, `queries_min`, falling back to `queries`), prints per-query
ratios, flags gate breaches, and exits non-zero on one:

  - any per-query ratio > --max-ratio (default 2.0, the standing gate)
  - any absolute drift > --band seconds (default 0.4, the documented
    per-query noise band) AND ratio > --band-ratio (default 1.2) —
    both conditions, so a 10 s query drifting 0.5 s at 1.05x is noise,
    not a breach

Usage:
  python3 tools/bench_gate.py BENCH_r12_full.json BENCH_r13_full.json
  python3 tools/bench_gate.py OLD NEW --band 0.4 \
      --derived BENCH_DERIVED.json --pair-name r13_vs_r12

With --derived, the computed headline quantities (sum ratio, worst
per-query ratio, worst absolute drift, median ratio, both sums) are
upserted into the named JSON under pairs.<pair-name>. That artifact is
what StreamBenchDocSpec's ratio/seconds gate checks doc claims
against: quoting a new cross-round headline in the docs REQUIRES
committing the derived row this tool produces (the same
artifact-backed convention the events/sec gate enforces).
"""
import argparse
import json
import statistics
import sys


def qmap(path):
    with open(path) as f:
        d = json.load(f)
    m = d.get("queries_min") or d.get("queries")
    if not m and isinstance(d.get("tail"), str):
        # driver-recorded BENCH_rNN.json wraps the bench's printed JSON
        # line inside the captured process tail — recover it
        import re
        for cand in re.findall(r'\{"metric".*\}', d["tail"]):
            try:
                inner = json.loads(cand)
            except json.JSONDecodeError:
                continue
            m = inner.get("queries_min") or inner.get("queries") or m
    if not m:
        sys.exit(f"{path}: no queries_min/queries map")
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--band", type=float, default=0.4,
                    help="absolute per-query drift band in seconds")
    ap.add_argument("--band-ratio", type=float, default=1.2,
                    help="ratio floor for an absolute-band flag")
    ap.add_argument("--max-ratio", type=float, default=2.0,
                    help="hard per-query ratio gate")
    ap.add_argument("--derived", help="BENCH_DERIVED.json to upsert the headline row into")
    ap.add_argument("--pair-name", help="row key inside --derived (e.g. r13_vs_r12)")
    ap.add_argument("--exclude", action="append", default=[],
                    help="adjudicated outlier queries to drop from the comparison "
                         "(e.g. q45_approx_stats vs the r1 table — re-semanticized "
                         "in round 7, compared against its own r11 baseline row instead)")
    args = ap.parse_args()

    old, new = qmap(args.old), qmap(args.new)
    shared = sorted((set(old) & set(new)) - set(args.exclude))
    if not shared:
        sys.exit("no shared queries")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))

    rows = []
    for q in shared:
        o, n = old[q], new[q]
        ratio = n / o if o > 0 else float("inf")
        rows.append((q, o, n, ratio, n - o))
    rows.sort(key=lambda r: -r[3])

    sum_old = sum(old[q] for q in shared)
    sum_new = sum(new[q] for q in shared)
    ratios = [r[3] for r in rows]
    worst = rows[0]
    worst_abs = max(rows, key=lambda r: r[4])

    print(f"# bench_gate {args.old} -> {args.new}: {len(shared)} shared queries"
          + (f" (+{len(only_new)} new, -{len(only_old)} removed)" if only_old or only_new else ""))
    print(f"{'query':28} {'old':>8} {'new':>8} {'ratio':>7} {'drift':>7}")
    breaches = []
    for q, o, n, ratio, drift in rows:
        flag = ""
        if ratio > args.max_ratio:
            flag = f"  << BREACH ratio>{args.max_ratio}x"
        elif drift > args.band and ratio > args.band_ratio:
            flag = f"  << BREACH drift>{args.band}s @ {ratio:.2f}x"
        if flag:
            breaches.append(q)
        print(f"{q:28} {o:8.2f} {n:8.2f} {ratio:6.2f}x {drift:+7.2f}{flag}")

    headline = {
        "old": args.old,
        "new": args.new,
        "shared_queries": len(shared),
        "sum_old_sec": round(sum_old, 1),
        "sum_new_sec": round(sum_new, 1),
        "sum_ratio": round(sum_new / sum_old, 3),
        "worst_query": worst[0],
        "worst_ratio": round(worst[3], 2),
        "worst_abs_query": worst_abs[0],
        "worst_abs_sec": round(worst_abs[4], 2),
        "median_ratio": round(statistics.median(ratios), 2),
    }
    print()
    print(json.dumps(headline, indent=1))

    if args.derived:
        if not args.pair_name:
            sys.exit("--derived requires --pair-name")
        try:
            with open(args.derived) as f:
                derived = json.load(f)
        except FileNotFoundError:
            derived = {}
        derived.setdefault("pairs", {})[args.pair_name] = headline
        # StreamBenchDocSpec requires a history array; a from-scratch
        # regeneration must not produce a file the suite hard-fails on
        derived.setdefault("history", [])
        with open(args.derived, "w") as f:
            json.dump(derived, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"# upserted pairs.{args.pair_name} into {args.derived}")

    if breaches:
        print(f"# GATE BREACH: {len(breaches)} queries: {', '.join(breaches)}", file=sys.stderr)
        return 1
    print("# gate: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
