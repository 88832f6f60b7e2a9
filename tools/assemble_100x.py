#!/usr/bin/env python3
"""Assemble CORRECTNESS_r{N}_100x.json from the round's chunked sweep and
retry logs.

The 100x oracle sweep runs as one check.py process per query (see the
chain scripts under /tmp): the fullsweep log carries one PASS/FAIL line
per query, and the closure/retry logs carry the heavy slots that needed
individual memory/spill/timeout budgets. This stitches them into the
same artifact shape as CORRECTNESS_r08_100x.json.

Usage:
  python3 tools/assemble_100x.py <out.json> <fullsweep.log> \
      [--extra name=verdict=detail=note ...]   # heavy-slot entries
"""
import json
import re
import sys


def main():
    out_path, sweep_log = sys.argv[1], sys.argv[2]
    queries = {}
    line_re = re.compile(
        r"^(PASS|FAIL|SKIP|MISS|NOVERDICT)\s+(\S+)\s*(.*)$")
    for line in open(sweep_log):
        m = line_re.match(line.strip())
        if not m:
            continue
        verdict, name, detail = m.groups()
        if verdict == "SKIP":
            continue  # closure/retry slots arrive via --extra
        queries[name] = {
            "verdict": "PASS" if verdict == "PASS" else verdict,
            "detail": detail.strip(),
        }
    for arg in sys.argv[3:]:
        if arg == "--extra":
            continue
        name, verdict, detail, note = arg.split("=", 3)
        queries[name] = {"verdict": verdict, "detail": detail}
        if note:
            queries[name]["note"] = note
    summary = {}
    for q in queries.values():
        summary[q["verdict"]] = summary.get(q["verdict"], 0) + 1
    doc = {
        "fixture": "/tmp/sf100x (make_scale_fixture.py factor=100 of "
                   "sf0.1, row_group=10000; 5M docs / 200k vectors)",
        "method": "chunked per-query DuckDB oracle check (tools/check.py),"
                  " one process per query; heavy slots retried with "
                  "dedicated memory_limit/threads/spill budgets",
        "summary": summary,
        "mismatches": sum(1 for q in queries.values()
                          if q["verdict"] == "FAIL"),
        "queries": dict(sorted(queries.items())),
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    print(f"{out_path}: {summary} over {len(queries)} queries")


if __name__ == "__main__":
    main()
