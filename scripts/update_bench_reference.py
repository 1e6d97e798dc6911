#!/usr/bin/env python3
"""Regenerate bench_reference.json from a quiet bench record.

Usage: python3 scripts/update_bench_reference.py <bench.json> [note]

The reference file is what graft.Bench uses for its outlier re-run
pass: a query whose best-of-N exceeds 3x its reference time gets extra
attempts so a transient load spike can't stick to the committed record.
Only update it from a run you believe was clean (sentinel_before/after
in agreement, loadavg low) — the reference IS the definition of clean.

Format is deliberately flat (one `source` string + a `queries` object
of name:number) so Bench.scala can recover it with a regex instead of
a JSON library.
"""
import json
import sys

record = json.load(open(sys.argv[1]))
note = sys.argv[2] if len(sys.argv) > 2 else sys.argv[1]
queries = {k: v for k, v in record["queries"].items()
           if isinstance(v, (int, float))}
with open("bench_reference.json", "w") as f:
    json.dump({"source": note, "queries": queries}, f,
              indent=0, sort_keys=True)
print(f"bench_reference.json: {len(queries)} reference times from {note}")
