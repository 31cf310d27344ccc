"""Combine partial ATE experiment JSONs (parallel workers) into one artifact.

Usage: python tools/combine_ate.py OUT.json PART1.json PART2.json ...
Rows are merged by repeat index; summary statistics are recomputed.
"""

import json
import sys

import numpy as np


def main():
    out_path, parts = sys.argv[1], sys.argv[2:]
    base = None
    rows = {}
    for p in parts:
        d = json.load(open(p))
        if base is None:
            base = d
        for r in d["rows"]:
            rows[r["repeat"]] = r
    rows = [rows[k] for k in sorted(rows)]
    ates = np.asarray([r["ate"] for r in rows if r["ate"] is not None],
                      np.float64)
    finite = ates[np.isfinite(ates)]
    up = [r["upload_mb"] for r in rows if r.get("upload_mb")]
    upr = [r["upload_mb_raw"] for r in rows if r.get("upload_mb_raw")]
    base.update({
        "repeats_done": len(rows),
        "complete": True,
        "ate_m": {
            "median": float(np.median(finite)) if len(finite) else None,
            "mean": float(np.mean(finite)) if len(finite) else None,
            "min": float(np.min(finite)) if len(finite) else None,
            "max": float(np.max(finite)) if len(finite) else None,
            "n_finite": int(len(finite)),
        },
        "rate_mean": float(np.mean([r["rate"] for r in rows])),
        "n_merges_total": int(sum(r["n_merges"] for r in rows)),
        "merged_runs": int(sum(1 for r in rows if r["n_merges"] > 0)),
        "upload_mb_mean": float(np.mean(up)) if up else 0.0,
        "upload_mb_raw_mean": float(np.mean(upr)) if upr else 0.0,
        "rows": rows,
    })
    with open(out_path, "w") as f:
        json.dump(base, f, indent=1)
    print(json.dumps({k: base[k] for k in
                      ("ate_m", "rate_mean", "merged_runs", "repeats_done")},
                     indent=1))


if __name__ == "__main__":
    main()
