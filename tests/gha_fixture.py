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


# --- round-7 widened parity set (checked-in gz only) ---------------------
#
# EXTRA_EVENTS + EXTRA_MALFORMED ship ONLY in the checked-in parity gzip
# (tools_gen_gha_fixture.py) that the driver-hashed gha_* queries read on
# BOTH engines; the golden pytests keep the small EVENTS set above, so
# their exact-value assertions stay stable. Purpose (r5 verdict task 6):
# make the 9 driver-hashed parity rows hard to pass by accident — deeper
# multi-commit pushes, unicode/control-char/null message edges,
# offset/'Z'/fractional timestamps that move events across midnight and
# a DST boundary, exact popularity-threshold repos, case-sensitivity
# edges for the bot filter and keyword match, envelope-less lines, and
# more corrupt variants.
#
# Cross-engine constraints (probed, r7 session): valid-JSON non-object
# lines ([1,2,3], "str", 42, null, true) and schema-type-violating
# payloads are corrupt to Spark's PERMISSIVE from_json but json_valid to
# DuckDB — NEVER add those. Offset/'Z'/fractional ISO timestamps cast
# identically (both normalize to naive UTC).

_MSG_EDGES = [
    "Deploy DASK cluster nightly",          # upper-case keyword hit
    "daskboard tweak only",                 # no leading space: miss
    "mention (dask) in parens",             # punctuation before: miss
    "use dask! now",                        # hit with trailing punct
    "速度 dask 改善 \U0001f680",  # unicode + emoji hit
    "multi\nline dask message",             # embedded newline hit
    'quote " and backslash \\ dask',        # escapes hit
    "tab\tdask indent",                     # tab, no space: miss (the
                                            # ' dask' idiom needs a
                                            # literal space char)
    "tab\t dask indent",                    # tab THEN space: hit
    "plain refactor, nothing here",         # miss
    None,                                   # null message: 3VL miss
]

_EXTRA_REPOS = [
    ("org/alpha", 25),   # very popular
    ("org/beta", 7),     # popular
    ("org/gamma", 6),    # exactly 6: > 5 boundary, qualifies
    ("org/edge5", 5),    # exactly 5: must NOT qualify
    ("org/cold", 2),
    ("dask/distributed", 9),  # popular but prefix-excluded from commits
    ("notdask/tools", 8),     # prefix edge: must NOT be excluded
]

_TS_FORMS = [
    "2024-02-29T23:59:59Z",            # leap-day last second, Z form
    "2024-03-01T01:30:00+02:00",       # offset moves it BACK across midnight
    "2024-02-29T20:30:00-05:00",       # offset moves it FORWARD across midnight
    "2024-03-31T02:30:00+02:00",       # CEST DST-transition morning
    "2024-02-29T22:45:10.500+00:00",   # fractional seconds
    "2024-03-01T00:00:00Z",            # exact midnight
]

_EXTRA_AUTHORS = [
    "alice2", "bot-deploy", "robotnik", "Botond", "erin2", "frank2",
    "élodie", "user-42",
]
# bot filter is case-sensitive contains('bot'): bot-deploy and robotnik
# are excluded; Botond (capital B) is NOT — a dropped case edge flips
# the gha_keyword_commits hash.

EXTRA_EVENTS = [
    # watches establishing exact popularity counts per repo
    *[
        _ev(
            "WatchEvent",
            _TS_FORMS[w % len(_TS_FORMS)],
            f"w_{repo.replace('/', '_')}_{w}",
            repo,
            {"action": "started"},
        )
        for repo, n in _EXTRA_REPOS
        for w in range(n)
    ],
    # deep multi-commit pushes cycling authors/repos/message edges
    *[
        _ev(
            "PushEvent",
            _TS_FORMS[i % len(_TS_FORMS)],
            _EXTRA_AUTHORS[i % len(_EXTRA_AUTHORS)],
            _EXTRA_REPOS[i % len(_EXTRA_REPOS)][0],
            {
                "commits": [
                    {
                        "sha": (None if (i, c) == (3, 1) else f"x{i}_{c}"),
                        "message": _MSG_EDGES[(i + c) % len(_MSG_EDGES)],
                    }
                    for c in range(i % 9)  # 0..8 commits; i%9==0 → explode-drop
                ]
            },
        )
        for i in range(36)
    ],
    # push with payload missing entirely (null struct → no commits row)
    {
        "type": "PushEvent",
        "created_at": "2024-02-29T23:58:00Z",
        "actor": {"login": "noload"},
        "repo": {"name": "org/alpha"},
    },
    # creates: null ref, unicode description, tag ref_type
    _ev("CreateEvent", _TS_FORMS[1], "alice2", "org/alpha",
        {"ref_type": "repository", "ref": None, "description": "café ☕"}),
    _ev("CreateEvent", _TS_FORMS[3], "erin2", "org/beta",
        {"ref_type": "tag", "ref": "v1.0", "description": None}),
    # PRs: null body, keyword body, offset pr timestamps, distinct author
    _ev("PullRequestEvent", _TS_FORMS[2], "frank2", "org/alpha",
        {"action": "closed", "number": 101,
         "pull_request": {"title": "Switch to dask", "body": None,
                          "user": {"login": "alice2"},
                          "created_at": "2024-02-28T10:00:00+05:30"}}),
    _ev("PullRequestEvent", _TS_FORMS[4], "élodie", "org/gamma",
        {"action": "opened", "number": 102,
         "pull_request": {"title": "perf", "body": "we should try dask here",
                          "user": {"login": "élodie"},
                          "created_at": "2024-02-29T22:00:00Z"}}),
    # comments: keyword hits on popular + edge5 repos, null body, emoji
    _ev("IssueCommentEvent", _TS_FORMS[5], "user-42", "org/alpha",
        {"issue": {"number": 201, "title": "speed", "user": {"login": "alice2"},
                   "created_at": "2024-02-29T12:00:00Z"},
         "comment": {"body": "benchmarked with Dask \U0001f680", "author_association": "OWNER"}}),
    _ev("IssueCommentEvent", _TS_FORMS[0], "Botond", "org/edge5",
        {"issue": {"number": 202, "title": "cap", "user": {"login": "Botond"},
                   "created_at": "2024-02-29T11:00:00Z"},
         "comment": {"body": "what about dask?", "author_association": "NONE"}}),
    _ev("IssueCommentEvent", _TS_FORMS[1], "hank", "org/beta",
        {"issue": {"number": 203, "title": "null body", "user": {"login": "hank"},
                   "created_at": "2024-02-29T10:00:00Z"},
         "comment": {"body": None, "author_association": "MEMBER"}}),
    _ev("IssueCommentEvent", _TS_FORMS[2], "bot-deploy", "dask/distributed",
        {"issue": {"number": 204, "title": "excluded repo", "user": {"login": "x"},
                   "created_at": "2024-02-29T09:00:00Z"},
         "comment": {"body": "dask dask dask", "author_association": "CONTRIBUTOR"}}),
    # forks
    _ev("ForkEvent", _TS_FORMS[3], "alice2", "org/alpha", {}),
    _ev("ForkEvent", _TS_FORMS[4], "user-42", "notdask/tools", {}),
    # unknown event types with full envelopes → routing must drop
    _ev("ReleaseEvent", _TS_FORMS[0], "alice2", "org/alpha", {"action": "published"}),
    _ev("GollumEvent", _TS_FORMS[1], "erin2", "org/beta", {}),
    # envelope-less valid JSON → envelope filter, NOT corrupt
    {"type": "PushEvent", "actor": {"login": "nodate"}, "repo": {"name": "org/alpha"}},
    {"created_at": "2024-02-29T22:00:00Z", "actor": {"login": "notype"}, "repo": {"name": "org/alpha"}},
    {"type": "WatchEvent", "created_at": "2024-02-29T22:00:00Z", "repo": {"name": "org/alpha"}},
]

#: corrupt to BOTH engines (probed): truncated, bracket garbage,
#: unterminated string, free text
EXTRA_MALFORMED = [
    '{"type": "PushEvent", "payload": {"commits": [{"sha": "trunc"',
    "]][[",
    '"unterminated string here',
    "definitely not json éé",
]
