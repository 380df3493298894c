"""Regenerate the BASELINE.md per-query table from TWO back-to-back
bench.py suite spreads recorded in one idle window (the round-6
methodology, re-run in round 13 per VERDICT r12 next-round #4: the table
had decayed into the r6 core plus 26 add-on rows measured across many
host windows with per-row calibration caveats).

Usage:
    python bench.py && cp BENCH_SPREAD.json /tmp/suiteA.json
    python bench.py && cp BENCH_SPREAD.json /tmp/suiteB.json
    python tools/regen_baseline_table.py /tmp/suiteA.json /tmp/suiteB.json

Emits the markdown table (queries() insertion order, two columns) plus
the validation summary: per-query drift ratio between the two suites
(the methodology requires no row >1.5×), best sum, typ sum. `best` =
per-query min across both suites; `typ` = the worse of the two suites'
per-query medians — the round-6 definitions, unchanged.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit("usage: regen_baseline_table.py <suiteA.json> <suiteB.json>")
    a = json.load(open(sys.argv[1]))["spread"]
    b = json.load(open(sys.argv[2]))["spread"]
    assert set(a) == set(b), set(a) ^ set(b)

    import __spark_entry__ as e

    names = list(e.queries())
    not_measured = [n for n in names if n not in a]
    assert not not_measured, (
        "queries() entries missing from the suite spreads (re-run bench.py "
        f"after adding them — the CLAUDE.md BASELINE-row rule): {not_measured}"
    )
    missing = set(a) - set(names)
    assert not missing, f"spread has rows not in queries(): {missing}"

    rows = {}
    drift_bad = []
    for n in names:
        best = round(min(a[n]["min"], b[n]["min"]), 2)
        typ = round(max(a[n]["med"], b[n]["med"]), 2)
        rows[n] = (best, typ)
        ratio = max(a[n]["min"], b[n]["min"]) / max(1e-9, min(a[n]["min"], b[n]["min"]))
        if ratio > 1.5:
            drift_bad.append((n, round(ratio, 2), a[n]["min"], b[n]["min"]))

    half = (len(names) + 1) // 2
    left, right = names[:half], names[half:]
    print("| query | best | typ | | query | best | typ |")
    print("|---|---|---|---|---|---|---|")
    for i in range(half):
        ln = left[i]
        lcell = f"| {ln} | {rows[ln][0]:.2f} | {rows[ln][1]:.2f} |"
        if i < len(right):
            rn = right[i]
            lcell += f" | {rn} | {rows[rn][0]:.2f} | {rows[rn][1]:.2f} |"
        else:
            lcell += " | | | |"
        print(lcell)
    print()
    best_sum = round(sum(v[0] for v in rows.values()), 1)
    typ_sum = round(sum(v[1] for v in rows.values()), 1)
    sum_a = round(sum(v["min"] for v in a.values()), 1)
    sum_b = round(sum(v["min"] for v in b.values()), 1)
    print(f"suite min-sums: A={sum_a}s B={sum_b}s; best sum {best_sum}s, typ sum {typ_sum}s")
    if drift_bad:
        print(f"DRIFT >1.5x between suites (re-run the window): {drift_bad}")
    else:
        print("no per-query min drifted >1.5x between the two suites")


if __name__ == "__main__":
    main()
