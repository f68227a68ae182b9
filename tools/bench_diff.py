#!/usr/bin/env python3
"""Round-over-round bench comparison that compares like with like.

Usage: bench_diff.py <old> <new> [--top 20] [--ratio-flag 1.5]

Each argument is either a raw `graft.Bench` stdout JSON line/file or a
driver `BENCH_r{N}.json` wrapper (whose `tail` may hold only a truncated
suffix of the line — queries lost to truncation are reported as
incomparable, not as regressions).

Caveats the tool enforces so humans don't have to remember them:
- r8-and-earlier rows are NOT comparable to r9+ rows (the timed action
  changed from Dataset.count() to queryExecution.toRdd.count() in r9 —
  see Bench.scala). Pass --allow-pre-r9 to compare anyway.
- failed rows (-1.0) never enter ratio math; they are listed separately.
"""
import argparse
import json
import re
import sys


def load(path):
    """Return (queries: {name: sec}, failed: [name], meta: str)."""
    text = open(path).read()
    # direct Bench line (possibly sbt-prefixed) or driver wrapper
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        m = re.search(r'\{"metric".*\}', text)
        if not m:
            sys.exit(f"{path}: no bench JSON found")
        obj = json.loads(m.group(0))
    if "queries" in obj:
        qs, failed = obj["queries"], obj.get("failed", [])
        meta = f"sf={obj.get('sf')} reps={obj.get('reps')}"
    else:
        # driver wrapper: prefer parsed, fall back to scraping the tail
        parsed = obj.get("parsed")
        if isinstance(parsed, dict) and "queries" in parsed:
            qs, failed = parsed["queries"], parsed.get("failed", [])
        else:
            tail = obj.get("tail", "") or ""
            pairs = re.findall(r'"([A-Za-z0-9_]+)":(-?[0-9][0-9.eE+-]*)', tail)
            # exact meta key names, not prefixes: a prefix filter would
            # silently drop real queries (e.g. an ngram_* registry row)
            meta_keys = {"n", "rc", "cpus", "reps", "value", "sf"}
            qs = {k: float(v) for k, v in pairs if k not in meta_keys}
            failed = [k for k, v in qs.items() if v < 0]
        meta = f"wrapper sf={obj.get('sf')} (tail may be truncated)"
    qs = {k: float(v) for k, v in qs.items()}
    failed = sorted(set(failed) | {k for k, v in qs.items() if v < 0})
    qs = {k: v for k, v in qs.items() if v >= 0}
    return qs, failed, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--ratio-flag", type=float, default=1.5,
                    help="flag queries slower than this ratio (and Δ>0.3s)")
    ap.add_argument("--allow-pre-r9", action="store_true")
    args = ap.parse_args()

    for p in (args.old, args.new):
        m = re.search(r"BENCH_r0?([0-9]+)", p)
        if m and int(m.group(1)) < 9 and not args.allow_pre_r9:
            sys.exit(f"{p}: pre-r9 benches used Dataset.count() and are not "
                     "comparable to r9+ (see Bench.scala); --allow-pre-r9 to force")

    old, old_failed, old_meta = load(args.old)
    new, new_failed, new_meta = load(args.new)
    print(f"old: {args.old} ({old_meta}) — {len(old)} rows, {len(old_failed)} failed")
    print(f"new: {args.new} ({new_meta}) — {len(new)} rows, {len(new_failed)} failed")

    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"\nincomparable (only in old, e.g. tail truncation): {len(only_old)}")
    if only_new:
        print(f"new rows (no old measurement): {len(only_new)}: "
              + ", ".join(only_new[:10]) + (" …" if len(only_new) > 10 else ""))
    if new_failed:
        print(f"\nFAILED in new: {new_failed}")
    fixed = sorted(set(old_failed) - set(new_failed) & set(new))
    if fixed:
        print(f"fixed since old (failed → runnable): {len(fixed)}")

    rows = [(new[k] - old[k], (new[k] / old[k]) if old[k] > 0 else float("inf"), k)
            for k in common]
    rows.sort(key=lambda r: -abs(r[0]))
    print(f"\n{'query':34s} {'old s':>8s} {'new s':>8s} {'Δs':>7s} {'ratio':>6s}")
    for d, r, k in rows[: args.top]:
        flag = "  <-- REGRESSION" if (r > args.ratio_flag and d > 0.3) else ""
        print(f"{k:34s} {old[k]:8.2f} {new[k]:8.2f} {d:+7.2f} {r:6.2f}{flag}")

    regs = [k for d, r, k in rows if r > args.ratio_flag and d > 0.3]
    tot_old = sum(old[k] for k in common)
    tot_new = sum(new[k] for k in common)
    print(f"\ncomparable total: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new - tot_old:+.1f}s over {len(common)} queries)")
    # Split subtotals (r15 verdict task 7): the stream_* rows measure an
    # sf-independent micro-batch scheduling floor whose wobble dominates
    # headline diffs — batch is the subtotal that tracks operator cost.
    stream = [k for k in common if k.startswith("stream_")]
    batch = [k for k in common if not k.startswith("stream_")]
    if stream:
        for label, keys in (("batch", batch), ("stream-floor", stream)):
            o = sum(old[k] for k in keys)
            n = sum(new[k] for k in keys)
            print(f"  {label:12s} subtotal: {o:.1f}s -> {n:.1f}s "
                  f"({n - o:+.1f}s over {len(keys)} queries)")
    if regs:
        print(f"regressions (> x{args.ratio_flag} and > +0.3s): {regs}")
        sys.exit(1)
    print("no regressions above threshold")


if __name__ == "__main__":
    main()
