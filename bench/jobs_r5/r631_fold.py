#!/usr/bin/env python
"""Fold r631's fresh-subprocess rows into bench_configs_out.json with
round-5 stamps (one protocol, verdict r4 item 6), then print the
regenerated README table (bench/readme_table.py)."""
import json
import os
import subprocess
import sys

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

NOTE = ("round-5 fresh-subprocess best-of-{n} at shipped defaults "
        "(bench/configs.py, distinct seed per rep){extra}")
EXTRA = {
    1: "",
    2: "; the driver's fresh-process bench.py record is BENCH_r05.json",
    3: "",
    4: "",
    5: "",
}


def main(paths):
    rows = {}
    for path in paths:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or not line.startswith("{"):
                    continue
                row = json.loads(line)
                # Rows hand-stamped with a round-5 note (config 3's
                # g999 job record) keep it; bench/configs.py rows get
                # the uniform protocol note.
                if "round-5" not in row.get("note", ""):
                    n = 2 if row["config"] == 3 else 3
                    row["note"] = NOTE.format(n=n, extra=EXTRA.get(
                        row["config"], ""))
                rows[row["config"]] = row
    out = os.path.join(_ROOT, "bench_configs_out.json")
    old = {}
    with open(out) as f:
        for line in f:
            if line.strip():
                r = json.loads(line)
                old[r["config"]] = r
    old.update(rows)
    with open(out, "w") as f:
        for k in sorted(old):
            f.write(json.dumps(old[k]) + "\n")
    print(f"updated {out} with configs {sorted(rows)}")
    subprocess.run([sys.executable,
                    os.path.join(_ROOT, "bench", "readme_table.py")])


if __name__ == "__main__":
    main(sys.argv[1:] or ["/tmp/r631_quick.json", "/tmp/r631_c3.json"])
