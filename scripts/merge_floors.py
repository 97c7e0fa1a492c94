#!/usr/bin/env python3
"""Merge one or more bench_detail.json runs into bench_floor.json.

floor = min(existing floor_s, every supplied run's per-query time) —
the cross-run min protocol bench_floor.json documents. Extends the
floor table to EVERY query seen in a detail file, so the floor-aware
pass 2 (Bench.scala round 12) has a floor for the whole surface and
re-measures only genuine steal suspects.

Usage: python3 scripts/merge_floors.py bench_detail.json [more...]
Writes bench_floor.json in place.
"""
import sys, json, datetime

FLOOR = "bench_floor.json"

def main():
    try:
        base = json.load(open(FLOOR))
    except FileNotFoundError:
        base = {"floors": {}}
    floors = base.get("floors", {})
    sf = base.get("sf")
    for path in sys.argv[1:]:
        detail = json.load(open(path))
        sf = detail.get("sf", sf)
        for name, sec in detail.get("queries", {}).items():
            cur = floors.get(name)
            if cur is None:
                floors[name] = {"floor_s": round(sec, 3),
                                "insuite_s": round(sec, 3)}
            else:
                cur["insuite_s"] = round(min(cur.get("insuite_s", sec), sec), 3)
                cur["floor_s"] = round(min(cur["floor_s"], sec), 3)
    out = {
        "sf": sf,
        "protocol": base.get("protocol",
            "floor = min over isolated min-of-3 and in-suite cross-pass "
            "mins; extended per-round by merge_floors.py over calm "
            "bench_detail.json runs"),
        "date": datetime.date.today().isoformat(),
        "steal_pct_before": base.get("steal_pct_before", 0),
        "floors": floors,
    }
    json.dump(out, open(FLOOR, "w"), indent=1)
    print(f"{len(floors)} floors written to {FLOOR}")

if __name__ == "__main__":
    main()
