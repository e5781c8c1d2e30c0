"""Summarize a sweep_dynamics JSONL stream into per-arm medians +
collapse rates (VERDICT r2 task 8). Collapse heuristic: aborted runs, or
a final rFID worse than 3x the run's best AND worse than its step-500
starting point (the game died after improving), or non-finite curves.

    python scripts/summarize_sweep.py /tmp/sweep_r3.jsonl
"""

import json
import statistics
import sys


def collapsed(rec) -> bool:
    if rec["status"] != "ok":
        return True
    curve = [f for _, f in rec["curve"] if f is not None]
    if not curve:
        return True
    best, final, start = min(curve), curve[-1], curve[0]
    return final > 3 * best and final > start


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_r3.jsonl"
    arms = {}
    with open(path) as f:
        for line in f:
            if not line.startswith('{"arm"'):
                continue
            rec = json.loads(line)
            base = rec["arm"].partition("@")[0]
            arms.setdefault(base, []).append(rec)
    for base, recs in arms.items():
        bests = [r["best_rfid"] for r in recs if r["best_rfid"] is not None]
        finals = [r["final_rfid"] for r in recs if r["final_rfid"] is not None]
        print(json.dumps({
            "arm": base,
            "seeds": len(recs),
            "median_best_rfid": round(statistics.median(bests), 1) if bests else None,
            "best_rfid_per_seed": bests,
            "median_final_rfid": round(statistics.median(finals), 1) if finals else None,
            "collapse_rate": f"{sum(collapsed(r) for r in recs)}/{len(recs)}",
        }))


if __name__ == "__main__":
    main()
