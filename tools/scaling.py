#!/usr/bin/env python3
"""Build SCALING.md from two graft.Bench full-detail dumps.

Usage: scaling.py <bench_1x.json> <bench_10x.json> <factor> <out.md>

Slope = warm(10x) / warm(1x). With a ~0.5 s per-query scheduling +
presentation-sort floor, a perfectly linear data-bound query shows a
slope BELOW the replication factor (the floor doesn't scale); a slope
at or above the factor means the compute grew faster than the data —
flagged for inspection.
"""
import json
import sys


def main() -> None:
    f1, f10, factor, out = sys.argv[1], sys.argv[2], float(sys.argv[3]), sys.argv[4]
    with open(f1) as fh:
        a = json.load(fh)
    with open(f10) as fh:
        b = json.load(fh)
    qa, qb = a["queries"], b["queries"]
    na, nb = a.get("nosort_queries", {}), b.get("nosort_queries", {})
    rows = []
    for k in sorted(qa):
        if k not in qb:
            continue
        t1, t10 = qa[k], qb[k]
        slope = t10 / t1 if t1 > 0 else float("nan")
        # nosort slope strips the presentation-sort floor component
        ns = (nb[k] / na[k]) if na.get(k) and na[k] > 0 and k in nb else None
        rows.append((k, t1, t10, slope, ns))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[3] >= factor * 1.2]
    watch = [r for r in rows if factor <= r[3] < factor * 1.2]

    lines = []
    lines.append("# SCALING — measured slope, %gx replica of sf0.1\n" % factor)
    lines.append(
        "Replica: `graft.DebugReplicate` (copy-isomorphic: id-shifted facts,\n"
        "per-copy token-bijected documents, per-copy rotated embeddings, fixed\n"
        "dims) at `scratch/sf1r`. Bench: 3 passes (cold/warm/nosort) at both\n"
        "scales on the same quiet machine, local[32].\n")
    lines.append("| scale | warm total | cold total | nosort total |")
    lines.append("|---|---|---|---|")
    lines.append("| 1x (sf0.1) | %.1f s | %.1f s | %.1f s |"
                 % (a["total"], a["cold_total"], a["nosort_total"]))
    lines.append("| %gx | %.1f s | %.1f s | %.1f s |"
                 % (factor, b["total"], b["cold_total"], b["nosort_total"]))
    lines.append("")
    lines.append("Aggregate warm slope: **%.1fx for %gx data** "
                 % (b["total"] / a["total"], factor))
    lines.append("(sub-factor = the per-query scheduling/sort floor doesn't scale).\n")
    if flagged:
        lines.append("## Superlinear (slope >= %.1f) — needs action\n" % (factor * 1.2))
        lines.append("| query | 1x warm | %gx warm | slope | nosort slope |" % factor)
        lines.append("|---|---|---|---|---|")
        for k, t1, t10, s, ns in flagged:
            lines.append("| %s | %.2f | %.2f | %.1fx | %s |"
                         % (k, t1, t10, s, ("%.1fx" % ns) if ns else "-"))
        lines.append("")
    else:
        lines.append("## Superlinear (slope >= %.1f): none\n" % (factor * 1.2))
    if watch:
        lines.append("## At-factor (%.0fx <= slope < %.1fx) — data-bound, linear\n"
                     % (factor, factor * 1.2))
        lines.append("| query | 1x warm | %gx warm | slope | nosort slope |" % factor)
        lines.append("|---|---|---|---|---|")
        for k, t1, t10, s, ns in watch:
            lines.append("| %s | %.2f | %.2f | %.1fx | %s |"
                         % (k, t1, t10, s, ("%.1fx" % ns) if ns else "-"))
        lines.append("")
    lines.append("## All queries by slope\n")
    lines.append("| query | 1x warm | %gx warm | slope | nosort slope |" % factor)
    lines.append("|---|---|---|---|---|")
    for k, t1, t10, s, ns in rows:
        lines.append("| %s | %.2f | %.2f | %.1fx | %s |"
                     % (k, t1, t10, s, ("%.1fx" % ns) if ns else "-"))
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote %s; aggregate slope %.1fx; %d superlinear, %d at-factor"
          % (out, b["total"] / a["total"], len(flagged), len(watch)))


if __name__ == "__main__":
    main()
