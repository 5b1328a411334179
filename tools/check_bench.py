#!/usr/bin/env python3
"""Adjudicate a Bench artifact: regression vs. co-tenant load.

Recorded bench totals on this box inflate up to ~3x under co-tenant
load on UNCHANGED code (r5: 365 s recorded vs 58.6 s idle; r7: 221 s vs
73 s). Since r15 the JSON line carries PER-FAMILY calibration bands
(`calib_fams`: {family: [min_ms, max_ms]} over probes run at every
family boundary and every 8 queries inside a family) plus per-family
totals (`fam_tot`), so each family is scaled by ITS window's observed
load — a mid-run wave that a single post-run `calib_sec` could not see
(the r12-r14 phantom-regression class) shows up as that family's max
probe. The global `calib_sec` remains the fallback for older artifacts.

Usage:
    python3 tools/check_bench.py <bench.json|-> [prior_bench.json]
accepts a raw Bench stdout line, a driver BENCH_r{N}.json (the line is
inside its "tail"), target/bench_full.json, a `graft.Smoke time`
transcript (the `[time]` lines carry the same calib probe since r16,
so an idle re-time file is a first-class comparison side), or '-' for
stdin.

With a second artifact, also diffs per-query times (each side scaled by
its own family-window load when available, else the global factor) and
prints the top movers. A mover inside a family whose window saw load
(max probe > 1.5x idle on either side) is tagged `window loaded` rather
than `<-- LOOK`: re-time at idle before believing it.

Excusal bound (r16, was max-probe through r15): a family's excess is
excused by its window's MAX probe only when the window's MIN probe is
ALSO elevated (> 1.5x idle) — i.e. the load was sustained across the
window, not one transient boundary spike. Bench attributes each
boundary probe to BOTH adjacent families, so a single spike used to
inflate two families' excusal bounds; now a spiky-but-not-sustained
window is excused only by its min probe (~1x at idle = no excusal).
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


def parse_time_transcript(text):
    """A `graft.Smoke time` transcript as a bench-shaped dict. Since r17
    Smoke prints the calib probe before the set and after EVERY query,
    so each query is scaled by its own BRACKETING probes' min (the same
    window-local rule the bench's calib_fams families use) — one global
    ratio over-corrected shuffle-bound queries (r16 verdict #4: an
    unchanged query got `<-- LOOK` purely from the /7 global scale).
    r16 transcripts (one probe pair around the whole set) degrade to
    the run-wide bracket, i.e. the old behavior."""
    events = []
    for m in re.finditer(
            r"\[time\] calib (\d+) ms|\[time\] (?!calib\b)(\S+)\s+([0-9.]+) s",
            text):
        if m.group(1):
            events.append(("calib", int(m.group(1))))
        else:
            events.append(("q", m.group(2), float(m.group(3))))
    probes = [e[1] for e in events if e[0] == "calib"]
    queries, qcal = {}, {}
    last = None
    for i, e in enumerate(events):
        if e[0] == "calib":
            last = e[1]
        else:
            nxt = next((x[1] for x in events[i + 1:] if x[0] == "calib"),
                       None)
            bracket = [pb for pb in (last, nxt) if pb is not None]
            queries[e[1]] = e[2]
            if bracket:
                qcal[e[1]] = (min(bracket) / 1000.0, max(bracket) / 1000.0)
    if not queries:
        return None
    out = {"total": sum(queries.values()), "queries": queries,
           "n_queries": len(queries), "_transcript": True}
    if probes:
        out["calib_sec"] = min(probes) / 1000.0
    if qcal:
        out["calib_queries"] = qcal
    return out


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
    # the bench JSON line wins when present: an artifact whose log also
    # happens to contain stray [time] lines must parse as the (richer)
    # metric line, not as a partial transcript (r16 advice)
    try:
        return extract(raw)
    except SystemExit:
        pass
    t = parse_time_transcript(raw)
    if t is not None:
        return t
    raise SystemExit("no bench JSON line or [time] transcript in input")


def fam_of(name):
    fam = name.split("_")[0]
    return "q" if re.fullmatch(r"q\d+", fam) else fam


def fam_loads(b):
    """Per-family (min_load, max_load) factors from calib_fams, or None."""
    cf = b.get("calib_fams")
    if not cf:
        return None
    return {g: (max(1.0, lo / 1000.0 / IDLE_CALIB),
                max(1.0, hi / 1000.0 / IDLE_CALIB))
            for g, (lo, hi) in cf.items()}


def global_load(b):
    calib = b.get("calib_sec")
    return max(1.0, calib / IDLE_CALIB) if calib else 1.0


def query_loads(b):
    """A (lo, hi) load-factor lookup per query name: per-query bracket
    probes first (Smoke time transcripts since r17), else the query's
    family window (calib_fams), else the global factor."""
    qc = b.get("calib_queries")
    loads = fam_loads(b)
    g = global_load(b)

    def look(name):
        if qc and name in qc:
            lo, hi = qc[name]
            return (max(1.0, lo / IDLE_CALIB), max(1.0, hi / IDLE_CALIB))
        if loads is not None:
            return loads.get(fam_of(name), (g, g))
        return (g, g)
    return look


def scaled_queries(b):
    """Each query divided by its window's MIN-probe load (the
    load-robust floor — a min probe only inflates when load was
    sustained across the whole window): the query's own probe bracket
    when the artifact carries one, else its family window, else the
    global factor. Returns (scaled map, description, load lookup)."""
    q = b.get("queries", {})
    look = query_loads(b)
    if b.get("calib_queries"):
        desc = "per-query bracket min-probe"
    elif fam_loads(b) is not None:
        desc = "per-family min-probe"
    else:
        desc = f"global /{global_load(b):.2f}"
    return {k: v / look(k)[0] for k, v in q.items()}, desc, look


def diff_movers(cur, prev, top=5):
    """Per-query drift, both sides scaled to idle by their own calib."""
    cq, cdesc, clook = scaled_queries(cur)
    pq, pdesc, plook = scaled_queries(prev)
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
    print(f"\nper-query drift (cur: {cdesc}, prev: {pdesc}; "
          f"{len(both)} shared, +{len(added)} added, -{len(removed)} removed)")
    for k, p, c, d in movers:
        windows_loaded = any(
            look(k)[1] > 1.5 for look in (clook, plook))
        flag = ""
        if abs(d) > 0.5 and c > 2 * max(p, 0.05):
            flag = ("  (family window loaded — re-time idle before believing)"
                    if windows_loaded else " <-- LOOK")
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


def family_report(b):
    """Per-family window verdict: total, probe band, and the family's
    own load-adjusted total. Returns the family-scaled effective total.
    Excusal bound (r16): a window's MAX probe only excuses its excess
    when its MIN probe is also elevated (sustained load — every probe
    in the window saw it); a transient single-probe spike (which Bench
    attributes to BOTH adjacent families) excuses nothing beyond the
    min-probe floor. Returns None without calib_fams/fam_tot."""
    loads = fam_loads(b)
    ft = b.get("fam_tot")
    if loads is None or not ft:
        return None
    eff = 0.0
    noisy = []
    spiky = []
    for g in sorted(ft):
        lo, hi = loads.get(g, (1.0, 1.0))
        sustained = lo > 1.5
        eff += ft[g] / (hi if sustained else lo)
        if sustained:
            noisy.append(f"{g} (x{lo:.1f}-x{hi:.1f}, {ft[g]:.1f}s)")
        elif hi > 1.5:
            spiky.append(f"{g} (x{hi:.1f} spike, {ft[g]:.1f}s)")
    if noisy:
        print("sustained-loaded family windows (min probe > 1.5x idle, "
              "excused by max probe): " + ", ".join(noisy))
    if spiky:
        print("transient-spike windows (max probe > 1.5x but min quiet — "
              "NOT excused beyond the min-probe floor): " + ", ".join(spiky))
    if not noisy and not spiky:
        print("all family windows quiet (max probe <= 1.5x idle) — "
              "every per-query number in this artifact is trustworthy")
    return eff


def main(path, prior=None):
    b = load_bench(path)
    total = b.get("value", b.get("total"))
    n = b.get("n_queries") or len(b.get("queries", {}))
    calib = b.get("calib_sec")
    load = global_load(b)
    lo, hi = PER_QUERY_BAND[0] * n, PER_QUERY_BAND[1] * n
    cal = f"{calib}s" if calib else "MISSING (pre-r8 artifact)"
    print(f"total={total:.1f}s n={n} calib={cal} -> global load ~{load:.1f}x")
    print(f"idle envelope {lo:.0f}-{hi:.0f}s; "
          f"global load-adjusted total {total / load:.1f}s")
    fam_eff = family_report(b)
    if fam_eff is not None:
        print(f"family-scaled effective total {fam_eff:.1f}s "
              "(sustained windows / max probe, spiky windows / min probe)")
    spike_report(b)
    if prior:
        diff_movers(b, load_bench(prior))
    eff = fam_eff if fam_eff is not None else total / load
    if b.get("_transcript"):
        # a hand-picked `Smoke time` set is not envelope-judgeable (the
        # per-query band describes the full board's mix, not a slow-query
        # sample) — transcripts adjudicate as a diff side, not alone
        print("VERDICT: N/A (re-time transcript — pass it as the second "
              "artifact to diff against a bench run)")
        return 0
    if total <= hi:
        print("VERDICT: PASS (within idle envelope, no adjustment needed)")
        return 0
    if eff <= hi:
        print("VERDICT: PASS-INFLATED (window-local load explains the "
              "excess; re-measure idle before reading any per-query number)")
        return 0
    if calib is None and fam_eff is None:
        print("VERDICT: UNRESOLVED (over envelope, but no calib anchor to "
              "separate load from regression — re-measure idle)")
        return 1
    print("VERDICT: REGRESSION (excess NOT explained by observed load)")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "-",
                  sys.argv[2] if len(sys.argv) > 2 else None))
