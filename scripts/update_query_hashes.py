"""Regenerate QUERY_HASHES.json: a per-query fingerprint (md5 of the
query function's source + its oracle SQL) captured at the END of each
round, i.e. the code the round's correctness gate ran against.

__spark_entry__._auto_recheck compares current fingerprints against
this snapshot: a driver-green name whose fingerprint changed since the
snapshot needs a recheck — this catches queries.py-LOCAL changes
(shared helpers, inline rewrites) that git module-attribution can't
see. Run as the last step of a round's work:

    python scripts/update_query_hashes.py
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visual_asset_management_system_spark.queries import ORACLES, QUERIES


def fingerprints() -> dict[str, str]:
    out = {}
    for name, fn in QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = ""
        blob = src + "\n--oracle--\n" + ORACLES.get(name, "")
        out[name] = hashlib.md5(blob.encode()).hexdigest()
    return dict(sorted(out.items()))


if __name__ == "__main__":
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "QUERY_HASHES.json")
    with open(path, "w") as f:
        json.dump(fingerprints(), f, indent=1)
    print(f"wrote {len(fingerprints())} fingerprints to {path}")
