#!/usr/bin/env python3
"""Per-query bench delta report: old vs new BENCH_DETAIL files.

Usage: tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]

Accepts either detail format:
  flat   : {"queries": {"name": 1.234, ...}}                  (<= r5)
  banded : {"queries": {"name": {"med":..,"min":..,"max":..,
                                 "plan":".."}, ...}}          (>= r6)

For each query present in both files it prints the median ratio
new/old and classifies the delta:

  PLAN   the plan fingerprint changed (structural — a join strategy,
         aggregate mode, or pushdown flipped; always investigate)
  NOISE  ratio exceeds the threshold but the [min,max] bands overlap
         (host variance can explain it)
  DRIFT  ratio exceeds the threshold, bands are disjoint, same plan
         (real slowdown with a non-plan cause: data, caching, GC)
  ok     within threshold

Basis: when BOTH files carry a solo_med for a query (the bench's
fresh-session re-runs of its heaviest entries), the ratio compares
solo_med vs solo_med — suite medians conflate session-cache builds
and suite pressure (measured 1.3-1.9x on the heaviest entries), so
the solo number is the truthful per-query cost. The `basis` column
labels which number each row compared ('solo' or 'suite'). Bands
only exist for suite runs, so over-threshold solo deltas classify
directly as DRIFT (solo runs are already pressure-free).

Flat-format inputs have no bands/fingerprints, so band and plan
checks degrade gracefully (every over-threshold delta reports as
DRIFT? with a trailing '?').

Solo-DRIFT adjudication (automatic): solo runs execute at the SUITE
TAIL, where accumulated storage/GC debris can physically invert a
number (r8: q_topk_incremental solo 14.1 s vs first_run 2.6 s). Any
solo-basis DRIFT row therefore triggers ONE standalone re-measurement
— a fresh `sbt runMain graft.Bench` child JVM restricted to exactly
the flagged queries (SPARK_GRAFT_BENCH_ONLY), no suite, no debris —
and the row is re-classified against the re-measured solo median:
within threshold of old -> `DRIFT->noise(adj=X.XXs)`; still out ->
`DRIFT(adj=X.XXs)` (confirmed, investigate). `--no-adjudicate` skips
the re-run (CI without sbt, or a quick look); the re-run inherits the
NEW file's recorded sf dir.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile


def adjudicate(targets, sf_dir):
    """Re-measure `targets` standalone in a fresh JVM; return
    {query: re-measured solo median (or suite median fallback)}."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(tempfile.mkdtemp(prefix="bench-adj-"), "detail.json")
    env = os.environ.copy()
    env.update({
        "SPARK_GRAFT_BENCH_ONLY": ",".join(sorted(targets)),
        "SPARK_GRAFT_BENCH_SOLO": str(len(targets)),
        "SPARK_GRAFT_BENCH_OUT": out,
    })
    if sf_dir:
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
    print(f"-- adjudicating {len(targets)} solo-DRIFT entries in a fresh JVM "
          f"({', '.join(sorted(targets))}) ...", file=sys.stderr)
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=repo, env=env, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
    if r.returncode != 0 or not os.path.exists(out):
        print("-- adjudication bench run failed; keeping raw flags",
              file=sys.stderr)
        return {}
    remeasured = load(out)
    return {q: (v[4] if v[4] is not None else v[0])
            for q, v in remeasured.items()}


def load(path):
    with open(path) as f:
        d = json.load(f)
    out = {}
    for name, v in d.get("queries", {}).items():
        if isinstance(v, dict):
            out[name] = (v["med"], v.get("min"), v.get("max"), v.get("plan"),
                         v.get("solo_med"))
        else:
            out[name] = (float(v), None, None, None, None)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--no-adjudicate", action="store_true",
                    help="skip the fresh-JVM re-measurement of solo-DRIFT rows")
    a = ap.parse_args()
    old, new = load(a.old), load(a.new)
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared queries between the two files", file=sys.stderr)
        return 1
    rows = []
    for q in shared:
        om, olo, ohi, op, osolo = old[q]
        nm, nlo, nhi, np_, nsolo = new[q]
        # prefer the solo basis whenever both rounds measured it: the
        # suite median hides session-cache builds and suite pressure
        solo = osolo is not None and nsolo is not None
        oeff, neff = (osolo, nsolo) if solo else (om, nm)
        basis = "solo" if solo else "suite"
        ratio = neff / oeff if oeff > 0 else float("inf")
        plan_changed = op is not None and np_ is not None and op != np_
        bands_known = (not solo) and None not in (olo, ohi, nlo, nhi)
        overlap = bands_known and not (nlo > ohi or olo > nhi)
        if plan_changed:
            tag = "PLAN"
        elif ratio > a.threshold or ratio < 1 / a.threshold:
            if bands_known:
                tag = "NOISE" if overlap else "DRIFT"
            elif solo:
                tag = "DRIFT"
            else:
                tag = "DRIFT?"
        else:
            tag = "ok"
        rows.append((q, oeff, neff, ratio, tag, basis))
    # solo-DRIFT rows get ONE standalone fresh-JVM re-measurement each
    # (batched into a single child run) before anything is printed
    targets = [q for q, _, _, _, tag, basis in rows
               if tag == "DRIFT" and basis == "solo"]
    if targets and not a.no_adjudicate:
        with open(a.new) as f:
            sf_dir = json.load(f).get("sf")
        re_med = adjudicate(targets, sf_dir)
        fixed = []
        for q, oeff, neff, ratio, tag, basis in rows:
            if q in re_med:
                rm = re_med[q]
                rr = rm / oeff if oeff > 0 else float("inf")
                if 1 / a.threshold <= rr <= a.threshold:
                    tag = f"DRIFT->noise(adj={rm:.2f}s)"
                else:
                    tag = f"DRIFT(adj={rm:.2f}s)"
                neff, ratio = rm, rr
            fixed.append((q, oeff, neff, ratio, tag, basis))
        rows = fixed
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'ratio':>7s}  basis  flag")
    for q, om, nm, ratio, tag, basis in rows:
        if tag != "ok":
            print(f"{q:40s} {om:8.3f} {nm:8.3f} {ratio:7.2f}  {basis:5s}  {tag}")
    flagged = sum(1 for r in rows
                  if r[4] != "ok" and "->noise" not in r[4])
    # totals over the SHARED set only: added/removed queries would
    # otherwise skew the ratio and misread as drift
    to = sum(old[q][0] for q in shared)
    tn = sum(new[q][0] for q in shared)
    print(f"-- {len(shared)} shared queries, {flagged} flagged; "
          f"shared-total {to:.1f}s -> {tn:.1f}s "
          f"(x{tn / to:.2f}); only-old: {sorted(set(old) - set(new))}; "
          f"only-new: {sorted(set(new) - set(old))}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
