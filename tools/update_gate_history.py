"""Regenerate gate_history.json from the driver's CORRECTNESS_r*.json
artifacts.

gate_history.json maps query name -> the LAST round in which the
driver's own correctness artifact recorded the query fully green
(rows + schema + hash, no err).  ``__spark_entry__.queries()`` sorts
the registry ascending by this stamp (never-validated gates first), so
any driver budget cut always falls on the most recently validated
queries — the "staleness-ordered registry" invariant (judge r05 #2).

Run after each round: ``python tools/update_gate_history.py``.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green_queries(path: str) -> set[str]:
    with open(path) as f:
        art = json.load(f)
    out = set()
    for name, row in art.items():
        if not isinstance(row, dict):
            continue
        if (row.get("rows_match") and row.get("schema_match", True)
                and row.get("hash_match", True) and not row.get("err")):
            out.add(name)
    return out


def main() -> None:
    hist: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name in green_queries(path):
            hist[name] = max(hist.get(name, 0), rnd)

    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    registered = set(entry.queries())
    # drop retired names; registered-but-never-green stays absent (= 0)
    hist = {k: v for k, v in sorted(hist.items()) if k in registered}
    out = os.path.join(REPO, "gate_history.json")
    with open(out, "w") as f:
        json.dump(hist, f, indent=1, sort_keys=True)
        f.write("\n")
    stamped = len(hist)
    print(f"wrote {out}: {stamped} stamped / {len(registered)} registered "
          f"({len(registered) - stamped} never-validated, run first)")


if __name__ == "__main__":
    main()
