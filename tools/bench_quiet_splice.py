#!/usr/bin/env python3
"""Per-entry quiet BATCHES, spliced into a full-suite bench record — the
round-13 fallback for a host whose whole-suite pass spread never clears
the canonical gate (VERDICT r20 Next #1; precedent: SCALE.md "Round-13
batch N, same 5x method").

Why this converges where the canonical run does not: the canonical
degraded stamp is driven by the PASS-level gate — ambient load drifting
across a ~7-minute full-suite pass. A batch of ~25 entries sweeps in
~30-60 s, so drift lands BETWEEN batches (where it does not matter — each
batch is retried until its own run is quiet) instead of inside the
measurement window. Each batch run is the UNMODIFIED canonical Bench
(same session config, same warm-up + interleaved reps + median
methodology) restricted with SPARK_GRAFT_BENCH_ONLY; a batch is accepted
only when Bench itself does NOT stamp it degraded — i.e. the batch passed
the same two noise gates the full suite is held to (per-entry
rel-spread-median <= 0.25; pass gate when the batch is big enough to
carry a load signal). Batches that stay degraded after --max-attempts are
reported and the splice FAILS rather than shipping a partially-noisy
record.

The spliced record is written to bench_quiet.json in the canonical
full-line format (queries map = accepted per-entry medians, value = their
sum, n_queries = registry size) plus:
  "recorded": ISO date, "method": "r13-batch-splice",
  "batches": N, "batch_attempts": total runs.
Subset Bench runs never write the quiet record themselves (their totals
are partial by design) — only this tool assembles them, and only when
every batch converged.

Usage: python3 tools/bench_quiet_splice.py [--sf DIR] [--cpus N]
         [--batch-size K] [--max-attempts M] [--reps R] [--out FILE]
"""
import argparse
import datetime
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def registry_names(sf, cpus):
    """All registry entry names, read from the last full bench_out.json
    (the artifact every canonical run writes; its queries map is complete
    by construction — n_queries is cross-checked)."""
    prior = REPO / "bench_out.json"
    if prior.exists():
        try:
            d = json.loads(prior.read_text())
            if d.get("n_queries") == len(d.get("queries", {})):
                return sorted(d["queries"].keys())
        except Exception:
            pass
    raise SystemExit("no full bench_out.json to read the registry from; "
                     "run a full bench once first")


def run_batch(names, sf, cpus, reps, log):
    env = {
        "SPARK_GRAFT_SF_DIR": sf,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_REPS": str(reps),
        "SPARK_GRAFT_BENCH_ONLY": ",".join(names),
        "BENCH_OUT": "/tmp/bench_batch_out.json",
        # never let a subset run even look at the quiet record path
        "BENCH_QUIET": "/tmp/bench_batch_quiet_ignored.json",
    }
    import os
    full_env = dict(os.environ)
    full_env.update(env)
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       capture_output=True, text=True, cwd=REPO,
                       env=full_env)
    log.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:] + "\n")
    try:
        return json.loads(pathlib.Path("/tmp/bench_batch_out.json")
                          .read_text())
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--batch-size", type=int, default=25)
    ap.add_argument("--max-attempts", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=str(REPO / "bench_quiet.json"))
    args = ap.parse_args()

    names = registry_names(args.sf, args.cpus)
    batches = [names[i:i + args.batch_size]
               for i in range(0, len(names), args.batch_size)]
    merged, attempts_total = {}, 0
    log = open("/tmp/bench_quiet_splice.log", "w")
    for bi, batch in enumerate(batches):
        ok = False
        for attempt in range(1, args.max_attempts + 1):
            attempts_total += 1
            d = run_batch(batch, args.sf, args.cpus, args.reps, log)
            if d is None:
                print(f"batch {bi}: attempt {attempt} produced no artifact",
                      flush=True)
                continue
            deg = d.get("degraded", False)
            noise = d.get("noise", {})
            print(f"batch {bi} attempt {attempt}: total={d['value']:.1f}s "
                  f"degraded={deg} relmed={noise.get('rel_spread_median')} "
                  f"pass={noise.get('pass_totals')}", flush=True)
            if not deg and not any(v < 0 for v in d["queries"].values()):
                merged.update(d["queries"])
                ok = True
                break
        if not ok:
            raise SystemExit(
                f"batch {bi} ({batch[0]}..{batch[-1]}) never passed the "
                f"noise gates in {args.max_attempts} attempts — refusing "
                f"to splice a partially-noisy record")
    assert sorted(merged.keys()) == names
    total = sum(merged.values())
    today = datetime.date.today().isoformat()
    qmap = ",".join(f'"{k}":{merged[k]}' for k in sorted(merged))
    line = (f'{{"metric":"total","value":{total},"unit":"sec",'
            f'"queries":{{{qmap}}},"sf":"{args.sf}","mode":"warm",'
            f'"n_queries":{len(merged)},"reps":{args.reps},'
            f'"recorded":"{today}","method":"r13-batch-splice",'
            f'"batches":{len(batches)},"batch_attempts":{attempts_total}}}')
    pathlib.Path(args.out).write_text(line + "\n")
    print(f"spliced quiet record: {total:.1f}s over {len(merged)} entries "
          f"({len(batches)} batches, {attempts_total} runs) -> {args.out}")


if __name__ == "__main__":
    main()
