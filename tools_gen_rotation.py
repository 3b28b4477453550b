"""Generate the driver-rotation window from CORRECTNESS history.

The driver's correctness gate hashes only the FIRST 50 entries of the
``queries()`` registry dict. To keep every query driver-verified over
time, each round the registry order is rotated so the least-recently-
verified queries come first. Hand-maintained window lists drift (a typo
silently re-verifies green queries while the backlog starves), so this
tool derives the window mechanically:

    python tools_gen_rotation.py [--window 50]

Ordering (most-starved first):
  1. Queries whose latest driver row was red (hash/rows/schema mismatch
     or err) — known problems that must re-verify after a fix, most-stale
     round first.
  2. ``--promote a,b,c`` names (deduped, listed order) — unverified
     queries the current round's plan needs verified NOW (e.g. a judge
     next-round task) even though older backlog exists.
  3. Queries with NO driver row in any CORRECTNESS_r*.json, in registry
     add-order (oldest unverified first).
  4. Green queries, least-recently-verified round first, registry order
     within a round.

Prints a ready-to-paste ``_R5_WINDOW = [...]`` literal (name chosen from
the next round number) plus a backlog summary to stderr.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.abspath(__file__))


def load_history(before_round: int | None = None) -> tuple[dict[str, tuple[int, bool]], int]:
    """Map query name -> (latest round seen, was that row green), and max round.

    ``before_round`` restricts the scan to CORRECTNESS files with round
    strictly below it. The CI guard passes the window's own round here:
    the ``_RN_WINDOW`` paste is, by construction, derived from the
    history available when round N STARTED (rounds < N) — the driver
    drops ``CORRECTNESS_rN.json`` after the round's final commit, and
    without this cut the new artifact re-ranks the stalest greens and
    retroactively "stales" a paste that was correct when made (observed
    live in round 9).
    """
    latest: dict[str, tuple[int, bool]] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if before_round is not None and rnd >= before_round:
            continue
        max_round = max(max_round, rnd)
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, green)
    return latest, max_round


def registry_names() -> list[str]:
    """Registry names in ADD order (pre-rotation).

    NOT ``list(QUERIES)``: importing any queries submodule triggers the
    package ``__init__``, which applies the current round's rotation to
    QUERIES before anything can read it — a prior version of this tool
    listed QUERIES and silently ranked the backlog by the PREVIOUS
    window's order (current-window leftovers resurfacing first, oldest
    unverified starving — the exact failure the tool exists to
    prevent). ``registry.ADD_ORDER`` is appended at registration time
    and never reordered, so it survives the rotation.
    """
    sys.path.insert(0, REPO)
    from etl_github_spark.queries import registry  # noqa: PLC0415 — triggers full registration

    return list(registry.ADD_ORDER)


def compute_window(
    window: int = 50,
    promote: list[str] | None = None,
    before_round: int | None = None,
) -> list[str]:
    """The ranked window itself — shared by the CLI below and the CI
    guard (tests/test_new_invariants.py): a hand-pasted window that
    drifts from this ranking silently wastes driver slots, so the paste
    in queries/__init__.py is asserted equal to this function's output
    for the committed promote list. The guard passes ``before_round`` =
    the window's own round N (parsed from ``_RN_WINDOW``) so a driver
    artifact landing AFTER the paste cannot redden the suite."""
    promote = list(promote or [])
    latest, _ = load_history(before_round)
    names = registry_names()
    order = {n: i for i, n in enumerate(names)}
    unknown = [n for n in promote if n not in order]
    if unknown:
        raise SystemExit(f"--promote names not in registry: {unknown}")

    never = [n for n in names if n not in latest]
    red = [n for n in names if n in latest and not latest[n][1]]
    green = [n for n in names if n in latest and latest[n][1]]
    red.sort(key=lambda n: (latest[n][0], order[n]))
    green.sort(key=lambda n: (latest[n][0], order[n]))

    promoted = [n for n in promote if n not in red]
    rest_never = [n for n in never if n not in promoted]
    rest_green = [n for n in green if n not in promoted]
    ranked = red + promoted + rest_never + rest_green
    return ranked[:window]


def main() -> None:
    window = 50
    if "--window" in sys.argv:
        window = int(sys.argv[sys.argv.index("--window") + 1])
    promote: list[str] = []
    if "--promote" in sys.argv:
        promote = sys.argv[sys.argv.index("--promote") + 1].split(",")
    latest, max_round = load_history()
    names = registry_names()
    never = [n for n in names if n not in latest]
    red = [n for n in names if n in latest and not latest[n][1]]
    green = [n for n in names if n in latest and latest[n][1]]
    promoted = [n for n in promote if n not in red]
    win = compute_window(window, promote)

    print(f"# generated by tools_gen_rotation.py — round r{max_round + 1} window", file=sys.stderr)
    print(
        f"# registry={len(names)} never-verified={len(never)} "
        f"latest-red={len(red)} green={len(green)}; window={window}, "
        f"backlog after this window={max(0, len(never) + len(red) - window)}",
        file=sys.stderr,
    )
    var = f"_R{max_round + 1}_WINDOW"
    print(f"{var} = [")
    for n in win:
        if n in never:
            tag = "never driver-verified" + (" (promoted)" if n in promoted else "")
        else:
            rnd, g = latest[n]
            tag = f"{'green' if g else 'RED'} r{rnd:02d}"
        print(f'    "{n}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
