#!/usr/bin/env python3
"""Compare two bench JSON lines (bench_out.json format, or a BENCH_r{N}.json
driver artifact whose tail contains the line).

Usage: python3 scripts/bench_compare.py OLD NEW [--top N]

Prints total/median deltas and the biggest per-query regressions and
improvements, so a round's perf work is judged against the recorded
artifact instead of memory.
"""
import json, re, statistics, sys


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d and isinstance(d["queries"], dict):
        return d["queries"], d.get("value")
    # driver artifact: find the LAST parseable {"metric":...} line in the tail
    text = d.get("tail", raw) if isinstance(d, dict) else raw
    best = None
    for m in re.finditer(r'\{"metric":.*\}', text):
        try:
            cand = json.loads(m.group(0))
            if "queries" in cand:
                best = cand
        except json.JSONDecodeError:
            continue
    if best is None:
        # tail may have head-truncated the line: scrape "name":sec pairs
        pairs = dict((k, float(v)) for k, v in
                     re.findall(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', text))
        pairs.pop("value", None)
        if not pairs:
            sys.exit(f"{path}: no bench line found")
        return pairs, None
    return best["queries"], best.get("value")


def main():
    top = 10
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
        args = args[:2]
    old, old_total = load(args[0])
    new, new_total = load(args[1])
    both = sorted(set(old) & set(new))
    added, dropped = sorted(set(new) - set(old)), sorted(set(old) - set(new))
    print(f"old: {len(old)} queries, total {old_total or sum(old.values()):.2f}s, "
          f"median {statistics.median(old.values()):.2f}s")
    print(f"new: {len(new)} queries, total {new_total or sum(new.values()):.2f}s, "
          f"median {statistics.median(new.values()):.2f}s")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if dropped:
        print(f"dropped ({len(dropped)}): {', '.join(dropped)}")
    deltas = sorted(((new[q] - old[q], q) for q in both), reverse=True)
    regress = [(d, q) for d, q in deltas if d > 0.05][:top]
    improve = [(d, q) for d, q in reversed(deltas) if d < -0.05][:top]
    if regress:
        print("worst regressions:")
        for d, q in regress:
            print(f"  {q:32s} {old[q]:6.2f} -> {new[q]:6.2f}  (+{d:.2f}s)")
    if improve:
        print("best improvements:")
        for d, q in improve:
            print(f"  {q:32s} {old[q]:6.2f} -> {new[q]:6.2f}  ({d:.2f}s)")


if __name__ == "__main__":
    main()
