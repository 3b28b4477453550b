"""Golden GH-Archive-shaped NDJSON fixture (FIXTURES.md §B.1).

Covers: all six event types, PushEvent with 0/1/N commits, two dates
across an hour boundary, bot and non-bot usernames, dask/-prefixed and
other repos, keyword hits with case variants, malformed lines, and an
unknown event type that must be dropped.
"""

from __future__ import annotations

import gzip
import json
from pathlib import Path


def _ev(type_, created_at, login, repo, payload):
    return {
        "type": type_,
        "created_at": created_at,
        "actor": {"login": login},
        "repo": {"name": repo},
        "payload": payload,
    }


EVENTS = [
    # PushEvent with 2 commits, keyword in one message (case-varied)
    _ev(
        "PushEvent",
        "2024-02-29T22:10:00+00:00",
        "alice",
        "org/tools",
        {
            "commits": [
                {"sha": "a1", "message": "use Dask for the backfill"},
                {"sha": "a2", "message": "fix typo"},
            ]
        },
    ),
    # PushEvent with 1 commit by a bot (must be excluded from the query)
    _ev(
        "PushEvent",
        "2024-02-29T22:20:00+00:00",
        "dependabot",
        "org/tools",
        {"commits": [{"sha": "b1", "message": "bump dask to 2024.2"}]},
    ),
    # PushEvent with 0 commits (explode must drop the row, not fail)
    _ev("PushEvent", "2024-02-29T22:30:00+00:00", "carol", "org/empty", {"commits": []}),
    # PushEvent in the dask/ org (excluded by repo prefix)
    _ev(
        "PushEvent",
        "2024-02-29T23:59:59+00:00",
        "dave",
        "dask/dask",
        {"commits": [{"sha": "c1", "message": "refactor dask scheduler"}]},
    ),
    # PushEvent next day, keyword needs the leading space (" dask")
    _ev(
        "PushEvent",
        "2024-03-01T00:05:00+00:00",
        "erin",
        "org/tools",
        {"commits": [{"sha": "d1", "message": "daskboard is unrelated"}]},
    ),
    # CreateEvent (null ref / description allowed)
    _ev(
        "CreateEvent",
        "2024-02-29T22:15:00+00:00",
        "alice",
        "org/tools",
        {"ref_type": "branch", "ref": "feat", "description": None},
    ),
    # PullRequestEvent
    _ev(
        "PullRequestEvent",
        "2024-02-29T22:40:00+00:00",
        "frank",
        "org/tools",
        {
            "action": "opened",
            "number": 7,
            "pull_request": {
                "title": "Add dask runner",
                "body": None,
                "user": {"login": "frank"},
                "created_at": "2024-02-29T22:39:00+00:00",
            },
        },
    ),
    # IssueCommentEvent with keyword (x2 repos: popular and not)
    _ev(
        "IssueCommentEvent",
        "2024-03-01T00:20:00+00:00",
        "gina",
        "org/tools",
        {
            "issue": {
                "number": 11,
                "title": "perf",
                "user": {"login": "alice"},
                "created_at": "2024-02-29T20:00:00+00:00",
            },
            "comment": {"body": "try dask here", "author_association": "MEMBER"},
        },
    ),
    _ev(
        "IssueCommentEvent",
        "2024-03-01T00:25:00+00:00",
        "hank",
        "org/quiet",
        {
            "issue": {
                "number": 12,
                "title": "idea",
                "user": {"login": "hank"},
                "created_at": "2024-02-29T21:00:00+00:00",
            },
            "comment": {"body": "what about dask?", "author_association": "NONE"},
        },
    ),
    # WatchEvents: 6 on org/tools (popular), 1 on org/quiet
    *[
        _ev(
            "WatchEvent",
            f"2024-02-29T23:{m:02d}:00+00:00",
            f"user{m}",
            "org/tools",
            {"action": "started"},
        )
        for m in range(6)
    ],
    _ev("WatchEvent", "2024-02-29T23:30:00+00:00", "user9", "org/quiet", {"action": "started"}),
    # ForkEvent
    _ev("ForkEvent", "2024-03-01T01:00:00+00:00", "ivan", "org/tools", {}),
    # unknown type → dropped by routing (preprocess.py:130)
    _ev("GollumEvent", "2024-03-01T01:10:00+00:00", "judy", "org/tools", {}),
]

MALFORMED = ['{"type": "PushEvent", "created_at": ', "not json at all", "{}"]
# "{}" parses but has no envelope fields → dropped by the envelope filter
N_CORRUPT = 2  # only the two non-JSON lines are parse-corrupt


def write_fixture(dirpath: str | Path, gz: bool = True, n_files: int = 2) -> list[str]:
    """Write the fixture as n hourly NDJSON(.gz) files; returns paths."""
    dirpath = Path(dirpath)
    dirpath.mkdir(parents=True, exist_ok=True)
    lines = [json.dumps(e) for e in EVENTS] + MALFORMED
    chunks = [lines[i::n_files] for i in range(n_files)]
    paths = []
    for i, chunk in enumerate(chunks):
        name = f"2024-02-29-{22 + i}.json" + (".gz" if gz else "")
        p = dirpath / name
        data = ("\n".join(chunk) + "\n").encode()
        p.write_bytes(gzip.compress(data) if gz else data)
        paths.append(str(p))
    return paths
