#!/usr/bin/env python3
"""Assemble BENCH_MEDIANS from N bench logs (each a graft.Bench stdout
capture): per-query median/min/max across passes, plus totals.

Usage: python3 tools/assemble_medians.py OUT.json NOTE log1 [log2 ...]
"""
import json
import re
import statistics
import sys


def main():
    out, note, logs = sys.argv[1], sys.argv[2], sys.argv[3:]
    passes = []
    for path in logs:
        m = re.search(r'\{"metric".*\}', open(path).read())
        if not m:
            raise SystemExit(f"no bench JSON in {path}")
        passes.append(json.loads(m.group(0)))
    names = sorted(passes[0]["queries"])
    queries = {}
    for n in names:
        xs = sorted(p["queries"][n] for p in passes)
        queries[n] = {
            "median": round(statistics.median(xs), 3),
            "min": round(xs[0], 3),
            "max": round(xs[-1], 3),
        }
    doc = {
        "note": note,
        "sf": passes[0]["sf"],
        "passes": len(passes),
        "failed": sorted({f for p in passes for f in p.get("failed", [])}),
        "totals": [round(p["value"], 2) for p in passes],
        "queries": queries,
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{out}: {len(names)} queries, totals={doc['totals']}, failed={doc['failed']}")


if __name__ == "__main__":
    main()
