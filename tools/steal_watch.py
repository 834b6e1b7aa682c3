#!/usr/bin/env python3
"""Steal-certified benchmark runner — the recording protocol
BASELINE.md's round-14 note documents, as a committed script.

This session's host carries an EPISODIC noisy neighbor (multi-hour
windows of 4,000-6,000 stolen ticks/minute with the guest idle);
recordings taken inside such a window read uniformly ~1.3x slow on
untouched queries. The protocol: wait until the host is QUIET — two
consecutive sub-threshold minutes of /proc/stat steal — then run the
bench and record the steal ticks accumulated DURING the run into a
certification sidecar, so any future reader can tell a contended
recording from a clean one without re-running anything.

Usage:
    python3 tools/steal_watch.py [--threshold 600] [--max-wait-min 240]
        [--cert CERT.json] -- <command...>

e.g.
    python3 tools/steal_watch.py --cert BENCH_r15_cert.json -- \
        env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"

Exit code: the wrapped command's (or 3 if the quiet window never
arrived within --max-wait-min; nothing is run in that case).
"""
import argparse
import json
import subprocess
import sys
import time


def steal_ticks() -> int:
    with open("/proc/stat") as f:
        cpu = f.readline().split()
    # cpu user nice system idle iowait irq softirq steal ...
    return int(cpu[8])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=int, default=600,
                    help="max stolen ticks per minute to count as quiet (default 600)")
    ap.add_argument("--quiet-minutes", type=int, default=2,
                    help="consecutive quiet minutes required before running (default 2)")
    ap.add_argument("--max-wait-min", type=int, default=240,
                    help="give up (exit 3) after this many minutes of waiting")
    ap.add_argument("--cert", default="target/steal_cert.json",
                    help="certification sidecar path (default target/steal_cert.json)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the command to run")
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (append: -- <command...>)")

    # ---- wait for the quiet window ----
    waited, quiet, minutes = 0, 0, []
    prev = steal_ticks()
    while quiet < args.quiet_minutes:
        if waited >= args.max_wait_min:
            print(f"steal_watch: no {args.quiet_minutes} consecutive quiet minutes "
                  f"(<{args.threshold} ticks) within {args.max_wait_min} min — giving up; "
                  f"last minutes: {minutes[-10:]}", file=sys.stderr)
            return 3
        time.sleep(60)
        waited += 1
        cur = steal_ticks()
        delta = cur - prev
        prev = cur
        minutes.append(delta)
        quiet = quiet + 1 if delta < args.threshold else 0
        print(f"steal_watch: minute {waited}: {delta} stolen ticks "
              f"({quiet}/{args.quiet_minutes} quiet)", file=sys.stderr)

    # ---- run, certifying ----
    s0, t0 = steal_ticks(), time.time()
    rc = subprocess.run(cmd).returncode
    s1, t1 = steal_ticks(), time.time()
    cert = {
        "steal_ticks_during_run": s1 - s0,
        "run_seconds": round(t1 - t0, 1),
        "threshold_ticks_per_min": args.threshold,
        "waited_minutes": waited,
        "pre_run_minutes_ticks": minutes,
        "command": cmd,
        "returncode": rc,
    }
    with open(args.cert, "w") as f:
        json.dump(cert, f, indent=1)
    print(f"steal_watch: {s1 - s0} stolen ticks over {cert['run_seconds']} s run; "
          f"cert -> {args.cert}", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
