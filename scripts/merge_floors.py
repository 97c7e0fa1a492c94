#!/usr/bin/env python3
"""Merge one or more bench_detail.json runs into bench_floor.json.

floor = min(existing floor_s, every supplied run's per-query time) —
the cross-run min protocol bench_floor.json documents. Extends the
floor table to EVERY query seen in a detail file, so the floor-aware
pass 2 (Bench.scala round 12) has a floor for the whole surface and
re-measures only genuine steal suspects.

Poison guards (ADVICE r12): a detail file's value for a query that
never measured clean is the 180 s FailPenaltyS poison or a watchdog
cap, NOT a measurement — seeding a floor from it would make the
floor-aware pass 2 accept anything up to 1.5x the poison as "clean".
Bench marks those names in the detail file's "suspect" list (round
13); entries there are skipped. Defense in depth for detail files
from older Bench binaries without the marker: any value >=
SUSPECT_CUTOFF_S is also skipped when CREATING a new floor entry
(existing floors can still only shrink, so a cutoff miss cannot
inflate one).

SF guard: a detail file measured at a different scale factor than the
floor file is rejected outright — floors are sf-scoped (Bench's
loadFloors enforces the same on the read side).

Usage: python3 scripts/merge_floors.py bench_detail.json [more...]
Writes bench_floor.json in place.
"""
import sys, json, datetime

FLOOR = "bench_floor.json"
SUSPECT_CUTOFF_S = 120.0  # >= the smallest poison/cap a final value can carry


def sf_token(s):
    return (s or "").rstrip("/").split("/")[-1]


def main():
    try:
        base = json.load(open(FLOOR))
    except FileNotFoundError:
        base = {"floors": {}}
    floors = base.get("floors", {})
    sf = base.get("sf")
    for path in sys.argv[1:]:
        detail = json.load(open(path))
        dsf = detail.get("sf", sf)
        if sf is not None and dsf is not None and sf_token(dsf) != sf_token(sf):
            sys.exit(f"REFUSED: {path} measured at sf '{dsf}' but {FLOOR} "
                     f"is scoped to '{sf}' — floors are per-SF")
        sf = dsf or sf
        suspect = set(detail.get("suspect", []))
        skipped = []
        for name, sec in detail.get("queries", {}).items():
            if name in suspect:
                skipped.append((name, sec, "suspect"))
                continue
            cur = floors.get(name)
            if cur is None:
                if sec >= SUSPECT_CUTOFF_S:
                    # no marker (old detail file) but the value is in
                    # poison/cap territory: never SEED a floor from it
                    skipped.append((name, sec, "cutoff"))
                    continue
                floors[name] = {"floor_s": round(sec, 3),
                                "insuite_s": round(sec, 3)}
            else:
                cur["insuite_s"] = round(min(cur.get("insuite_s", sec), sec), 3)
                cur["floor_s"] = round(min(cur["floor_s"], sec), 3)
        for name, sec, why in skipped:
            print(f"skipped {name} = {sec}s ({why})")
    out = {
        "sf": sf,
        "protocol": base.get("protocol",
            "floor = min over isolated min-of-3 and in-suite cross-pass "
            "mins; extended per-round by merge_floors.py over calm "
            "bench_detail.json runs; suspect (failed/timeout) values "
            "never seed or shrink a floor"),
        "date": datetime.date.today().isoformat(),
        "steal_pct_before": base.get("steal_pct_before", 0),
        "floors": floors,
    }
    json.dump(out, open(FLOOR, "w"), indent=1)
    print(f"{len(floors)} floors written to {FLOOR}")


if __name__ == "__main__":
    main()
