#!/usr/bin/env python3
"""Cross-round bench trend report (VERDICT r14 #6).

Joins the per-query timings of every BENCH_r*.json (the driver's
round artifacts — stdout projections, so each round carries its ~65
slowest entries plus the pinned anchors) and flags entries whose LATEST
non-degraded timing drifts more than DRIFT_X from their quiet median
(the median of their non-degraded history, excluding the latest round).
This automates the by-hand noise adjudication every round's judge
performed (r14: containment_dedup/tfidf_cosine_pairs vs a degraded r13).

Degraded artifacts ("degraded":true — contention-poisoned per Bench's
noise gate) and artifacts at a different sf are excluded from both the
history and the "latest" pick. parsed:null rounds (stdout beheaded,
rounds 1/5/8/9) never contribute.

Usage:
    python3 tools/bench_trend.py            # report to stdout
    python3 tools/bench_trend.py --scale    # also rewrite the generated
                                            # section in SCALE.md

Flags are advisory (exit 0 either way): a >1.5× drift on a sub-second
entry is usually scheduler jitter — the report prints absolute times so
a reader applies the documented sub-second noise bar (Bench.scala).
"""
import glob
import json
import re
import statistics
import sys

DRIFT_X = 1.5
SF = "/root/testdata/sf0.1"
# r12 was contention-poisoned 2.6× BEFORE Bench grew the degraded stamp
# (the round-12 lesson that motivated the noise gate) — its artifact
# carries no flag, so exclude it by number
KNOWN_DEGRADED = {12}
BEGIN = "<!-- BEGIN GENERATED bench trend (tools/bench_trend.py) -->"
END = "<!-- END GENERATED bench trend -->"


def load_quiet():
    """The repo's own quiet-canonical record (bench_quiet.json) as the
    LATEST trend point when it is newer than every BENCH_r* artifact:
    Bench only writes it on a NON-degraded full-suite pass, it carries
    the complete queries map (no stdout projection), and since r21 it is
    dated ("recorded"). This lets the trend advance in rounds whose
    driver artifact was degraded (r19-r20: two rounds with no usable
    trend point despite quiet in-round records)."""
    try:
        d = json.load(open("bench_quiet.json"))
        if d.get("sf") != SF or d.get("degraded") or "recorded" not in d:
            return None
        return (d["recorded"], d.get("queries", {}), d.get("value"))
    except Exception:
        return None


def load_rounds():
    rounds = []
    for path in sorted(glob.glob("BENCH_r*.json")):
        rnd = int(re.search(r"BENCH_r(\d+)", path).group(1))
        p = json.load(open(path)).get("parsed")
        if not p or p.get("degraded") or p.get("sf") != SF or rnd in KNOWN_DEGRADED:
            continue
        rounds.append((rnd, p.get("queries", {}), p.get("value")))
    return rounds


def main():
    rounds = load_rounds()
    quiet = load_quiet()
    if len(rounds) + (1 if quiet else 0) < 2:
        print("not enough non-degraded rounds to trend")
        return 0
    if quiet is not None:
        latest_rnd, latest_q, latest_total = quiet
        latest_lbl = f"quiet {latest_rnd}"
    else:
        latest_rnd, latest_q, latest_total = rounds[-1]
        latest_lbl = f"r{latest_rnd}"
        rounds = rounds[:-1]
    hist = {}
    for rnd, qs, _ in rounds:
        for name, sec in qs.items():
            if sec >= 0:
                hist.setdefault(name, []).append((rnd, sec))
    lines = []
    regress, improve = [], []
    for name, sec in sorted(latest_q.items()):
        h = hist.get(name)
        if not h or sec < 0:
            continue
        med = statistics.median(s for _, s in h)
        if med <= 0:
            continue
        ratio = sec / med
        if ratio > DRIFT_X:
            regress.append((ratio, name, sec, med, len(h)))
        elif ratio < 1 / DRIFT_X:
            improve.append((ratio, name, sec, med, len(h)))
    totals = ", ".join(f"r{r}={t:.1f}s" for r, _, t in rounds)
    lines.append(f"Non-degraded sf0.1 rounds: {totals}; latest = "
                 f"{latest_lbl} ({latest_total:.1f}s, full {len(latest_q)}-entry map)")
    lines.append("")
    lines.append(f"| Entry | {latest_lbl} sec | quiet median | × | history pts |")
    lines.append("|---|---|---|---|---|")
    for ratio, name, sec, med, n in sorted(regress, reverse=True):
        lines.append(f"| `{name}` ⚠ slower | {sec:.2f} | {med:.2f} | {ratio:.2f} | {n} |")
    for ratio, name, sec, med, n in sorted(improve):
        lines.append(f"| `{name}` ✓ faster | {sec:.2f} | {med:.2f} | {ratio:.2f} | {n} |")
    if not regress and not improve:
        lines.append(f"| (no entry drifted beyond {DRIFT_X}×) | | | | |")
    report = "\n".join(lines)
    print(report)
    print(f"\n== {len(regress)} slower, {len(improve)} faster beyond {DRIFT_X}× "
          f"(of {len(latest_q)} entries in {latest_lbl}'s map)")

    if "--scale" in sys.argv:
        src = open("SCALE.md").read()
        gen = "\n".join([
            BEGIN, "",
            f"### Cross-round bench trend (generated — latest {latest_lbl})",
            "",
            "Latest non-degraded round vs each entry's quiet median across",
            "prior non-degraded rounds; regenerate with",
            "`python3 tools/bench_trend.py --scale`. Sub-second entries",
            "jitter 10-30% by design (Bench.scala) — read flags above that bar.",
            "",
            report, "", END,
        ])
        if BEGIN in src:
            src = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), gen, src, flags=re.S)
        else:
            src = src.rstrip() + "\n\n" + gen + "\n"
        open("SCALE.md", "w").write(src)
        print("SCALE.md trend section updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
