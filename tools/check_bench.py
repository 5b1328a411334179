#!/usr/bin/env python3
"""Adjudicate a Bench artifact: regression vs. co-tenant load.

Recorded bench totals on this box inflate up to ~3x under co-tenant
load on UNCHANGED code (r5: 365 s recorded vs 58.6 s idle; r7: 221 s vs
73 s). The JSON line's `calib_sec` field — a fixed CPU-bound micro-task
timed best-of-three after the run — inflates by the same steal factor,
so it is the noise denominator: scale the idle expectation by
max(1, calib_sec / IDLE_CALIB) BEFORE declaring a regression.

Usage:
    python3 tools/check_bench.py <bench.json|-> [prior_bench.json]
accepts a raw Bench stdout line, a driver BENCH_r{N}.json (the line is
inside its "tail"), target/bench_full.json, or '-' for stdin.

With a second artifact, also diffs per-query times (both sides scaled
to idle by their own calib factor) and prints the top movers — the
r9-verdict item-6 class of drift (a query whose cost quietly doubled
between rounds) surfaces here instead of waiting for a judge to
eyeball 264 numbers. Queries present on only one side are listed as
added/removed, never diffed.
"""
import json
import re
import sys

# quiet-box anchors: calib_sec ~0.03-0.06 idle; per-query cost has
# measured 0.325-0.366 s/q across judged idle runs (r6/r8)
IDLE_CALIB = 0.04
PER_QUERY_BAND = (0.20, 0.42)  # sec/query, idle envelope


def extract(text):
    m = re.search(r'\{"metric":.*?"sf":[^}]*\}|\{"metric":.*\}', text)
    if not m:
        raise SystemExit("no bench JSON line found in input")
    # the metric line nests a "queries" object; grab to the final brace
    start = m.start()
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return json.loads(text[start:i + 1])
    raise SystemExit("unbalanced bench JSON line")


def load_bench(path):
    raw = sys.stdin.read() if path == "-" else open(path).read()
    try:
        outer = json.loads(raw)
        if isinstance(outer, dict) and "tail" in outer:
            raw = outer["tail"]
        elif isinstance(outer, dict) and "queries" in outer and "total" in outer:
            return outer  # target/bench_full.json shape
    except ValueError:
        pass
    return extract(raw)


def diff_movers(cur, prev, top=5):
    """Per-query drift, both sides scaled to idle by their own calib."""
    def scaled(b):
        calib = b.get("calib_sec")
        load = max(1.0, calib / IDLE_CALIB) if calib else 1.0
        return {k: v / load for k, v in b.get("queries", {}).items()}, load
    cq, cl = scaled(cur)
    pq, pl = scaled(prev)
    if not cq or not pq:
        print("per-query diff: one side carries no queries map "
              "(truncated tail?) — skipping")
        return
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))
    both = set(cq) & set(pq)
    movers = sorted(
        ((k, pq[k], cq[k], cq[k] - pq[k]) for k in both),
        key=lambda t: -abs(t[3]))[:top]
    print(f"\nper-query drift (idle-scaled: cur /{cl:.2f}, prev /{pl:.2f}; "
          f"{len(both)} shared, +{len(added)} added, -{len(removed)} removed)")
    for k, p, c, d in movers:
        flag = " <-- LOOK" if abs(d) > 0.5 and c > 2 * max(p, 0.05) else ""
        print(f"  {k:<32} {p:6.2f}s -> {c:6.2f}s  ({d:+.2f}s){flag}")
    if added:
        slow = sorted(added, key=lambda k: -cq[k])[:top]
        print("  new queries (slowest):",
              ", ".join(f"{k}={cq[k]:.2f}s" for k in slow))


def spike_report(b, top=5):
    """Per-pass forensics (r12 artifacts carry a "passes" map): a query
    whose passes disagree >3x was hit by a co-tenant spike during the
    run — its min is trustworthy, its max is not a regression signal."""
    passes = b.get("passes")
    if not passes:
        return
    # the 0.5s floor matches Bench's retry rule: sub-100ms queries trip
    # 3x on ordinary JIT/GC jitter, which is noise, not a spike
    spiky = sorted(
        ((k, v) for k, v in passes.items()
         if len(v) >= 2 and max(v) > 0.5 and max(v) > 3 * max(min(v), 1e-9)),
        key=lambda t: -(max(t[1]) / max(min(t[1]), 1e-9)))[:top]
    if spiky:
        print(f"\nspike forensics ({len(spiky)} of {len(passes)} queries "
              "saw a >3x pass spread — co-tenant spikes, min kept):")
        for k, v in spiky:
            print(f"  {k:<32} passes=" + ",".join(f"{x:.2f}s" for x in v))


def main(path, prior=None):
    b = load_bench(path)
    total = b.get("value", b.get("total"))
    n = b.get("n_queries") or len(b.get("queries", {}))
    calib = b.get("calib_sec")
    load = max(1.0, calib / IDLE_CALIB) if calib else 1.0
    lo, hi = PER_QUERY_BAND[0] * n, PER_QUERY_BAND[1] * n
    eff = total / load
    cal = f"{calib}s" if calib else "MISSING (pre-r8 artifact)"
    print(f"total={total:.1f}s n={n} calib={cal} -> load factor ~{load:.1f}x")
    print(f"idle envelope {lo:.0f}-{hi:.0f}s; load-adjusted total {eff:.1f}s")
    spike_report(b)
    if prior:
        diff_movers(b, load_bench(prior))
    if total <= hi:
        print("VERDICT: PASS (within idle envelope, no adjustment needed)")
        return 0
    if eff <= hi:
        print("VERDICT: PASS-INFLATED (load explains the excess; "
              "re-measure idle before reading any per-query number)")
        return 0
    if calib is None:
        print("VERDICT: UNRESOLVED (over envelope, but no calib anchor to "
              "separate load from regression — re-measure idle)")
        return 1
    print("VERDICT: REGRESSION (excess NOT explained by calib load factor)")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "-",
                  sys.argv[2] if len(sys.argv) > 2 else None))
