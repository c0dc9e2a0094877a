#!/usr/bin/env python3
"""Dev-only: merge a per-batch check_local.py json_out into a committed
CORRECTNESS_*.json artifact (the sf100 gate runs in table-family batches
so row-heavy dumps can be deleted between batches; each batch produces
its own report and this folds it in deterministically).

Usage: tools/merge_gate.py <target.json> <batch.json> [<batch.json>...]
Batch rows overwrite same-name target rows (a re-run is newer evidence).
Not part of the shipped library.
"""
import sys, json

def main():
    target = sys.argv[1]
    try:
        merged = json.load(open(target))
    except FileNotFoundError:
        merged = {}
    for b in sys.argv[2:]:
        batch = json.load(open(b))
        for k, v in batch.items():
            merged[k] = v
    with open(target, "w") as f:
        json.dump(dict(sorted(merged.items())), f, indent=2)
        f.write("\n")
    green = sum(1 for v in merged.values() if v.get("hash_match"))
    print(f"[merge_gate] {target}: {len(merged)} rows, {green} hash-green")

if __name__ == "__main__":
    main()
