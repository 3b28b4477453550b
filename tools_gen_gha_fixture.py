"""Regenerate the checked-in GHA NDJSON parity fixture.

The registry's `gha_*` parity queries (queries/gha_parity.py) pin the
reference's raw-NDJSON extraction path with driver CORRECTNESS rows;
both the Spark side and the DuckDB oracle read the SAME checked-in
gzip file so the driver hash covers gzip NDJSON scan + fault-tolerant
parse + nested projection + explode + timestamp/date derivation.

The content is the golden event set from tests/gha_fixture.py
(FIXTURES.md §B.1). Gzip is written with mtime=0 and no filename so the
artifact is byte-reproducible.

    python tools_gen_gha_fixture.py
"""

from __future__ import annotations

import gzip
import json
import os

REPO = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(REPO, "etl_github_spark", "gha", "fixtures", "events.ndjson.gz")


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    from tests.gha_fixture import (
        EVENTS,
        EXTRA_EVENTS,
        EXTRA_MALFORMED,
        MALFORMED,
    )

    # golden events + the round-7 widened parity set; malformed lines are
    # interleaved at the end (position is irrelevant to both parsers)
    lines = (
        [json.dumps(e) for e in EVENTS + EXTRA_EVENTS]
        + MALFORMED
        + EXTRA_MALFORMED
    )
    data = ("\n".join(lines) + "\n").encode()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "wb") as f:
        f.write(gzip.compress(data, mtime=0))
    print(f"wrote {OUT} ({len(lines)} lines, {os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
