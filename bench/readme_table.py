#!/usr/bin/env python
"""Regenerate README.md's performance table from bench_configs_out.json.

ONE protocol (VERDICT r3 item 6): every row is a fresh-subprocess
measurement with shipped defaults, round-stamped in the JSON's notes.
In-worker interleaved bests belong in footnotes/docs, never in the table.

Usage: python bench/readme_table.py   # prints the markdown table
"""

import json
import os

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

LABELS = {
    1: "1: test scene 400×200 @ 16 spp d8",
    2: "2: RTIOW final 1200×800 @ 100 spp (headline)",
    3: "3: 4K (3840×2160) @ 1000 spp, stratified + Russian roulette",
    4: "4: bunny-class mesh (mesh20k, 20 480 tris) 800×450 @ 50 spp",
    5: "5: 8-frame animated flythrough 640×480 @ 32 spp",
}


def main():
    rows = {}
    with open(os.path.join(_ROOT, "bench_configs_out.json")) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            rows[rec["config"]] = rec

    print("| BASELINE.json config | Result (primary Mrays/s) | wall | note |")
    print("|---|---|---|---|")
    for idx in sorted(rows):
        r = rows[idx]
        extra = f"; {r['fps']} fps" if "fps" in r else ""
        print(f"| {LABELS.get(idx, r['label'])} | **{r['value']}**{extra} "
              f"| {r.get('wall_s', '')} s | {r.get('note', '')} |")


if __name__ == "__main__":
    main()
