"""Explicit schemas for the GH Archive pipeline.

The reference declares no schemas anywhere (pandas infers per file,
Delta freezes on first append — SURVEY.md §1.3). Here every boundary is
an explicit StructType: the raw-event schema is the union of the fields
the six reference handlers read (preprocess.py:40-108), and each
normalized table pins the dtypes FIXTURES.md §B.2 documents.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


#: union of payload fields the reference's handlers touch
#: (preprocess.py:40-108); unknown payload fields are ignored by design.
RAW_EVENT_SCHEMA = _s(
    _f("type", StringType()),
    _f("created_at", StringType()),  # ISO-8601 with offset; parsed downstream
    _f("actor", _s(_f("login", StringType()))),
    _f("repo", _s(_f("name", StringType()))),
    _f(
        "payload",
        _s(
            # PushEvent (preprocess.py:40-48)
            _f(
                "commits",
                ArrayType(_s(_f("sha", StringType()), _f("message", StringType()))),
            ),
            # CreateEvent (preprocess.py:51-59)
            _f("ref_type", StringType()),
            _f("ref", StringType()),
            _f("description", StringType()),
            # PullRequestEvent / WatchEvent share "action" (preprocess.py:62-75,94-100)
            _f("action", StringType()),
            _f("number", LongType()),
            _f(
                "pull_request",
                _s(
                    _f("title", StringType()),
                    _f("body", StringType()),
                    _f("user", _s(_f("login", StringType()))),
                    _f("created_at", StringType()),
                ),
            ),
            # IssueCommentEvent (preprocess.py:78-91)
            _f(
                "issue",
                _s(
                    _f("number", LongType()),
                    _f("title", StringType()),
                    _f("user", _s(_f("login", StringType()))),
                    _f("created_at", StringType()),
                ),
            ),
            _f(
                "comment",
                _s(_f("body", StringType()), _f("author_association", StringType())),
            ),
        ),
    ),
)

_TS = TimestampType()
_STR = StringType()

#: normalized table schemas (FIXTURES.md §B.2); every table carries the
#: derived partition column date = to_date(created_at) (preprocess.py:160-161).
TABLE_SCHEMAS: dict[str, StructType] = {
    "commit": _s(
        _f("username", _STR),
        _f("repo", _STR),
        _f("sha", _STR),
        _f("message", _STR),
        _f("created_at", _TS),
        _f("date", DateType()),
    ),
    "create": _s(
        _f("username", _STR),
        _f("repo", _STR),
        _f("type", _STR),
        _f("name", _STR),
        _f("description", _STR),
        _f("created_at", _TS),
        _f("date", DateType()),
    ),
    "pr": _s(
        _f("username", _STR),
        _f("repo", _STR),
        _f("action", _STR),
        _f("number", LongType()),
        _f("title", _STR),
        _f("author", _STR),
        _f("body", _STR),
        _f("pr_created_at", _TS),
        _f("created_at", _TS),
        _f("date", DateType()),
    ),
    "comment": _s(
        _f("username", _STR),
        _f("repo", _STR),
        _f("number", LongType()),
        _f("title", _STR),
        _f("author", _STR),
        _f("issue_created_at", _TS),
        _f("comment", _STR),
        _f("association", _STR),
        _f("created_at", _TS),
        _f("date", DateType()),
    ),
    "watch": _s(
        _f("username", _STR),
        _f("repo", _STR),
        _f("action", _STR),
        _f("created_at", _TS),
        _f("date", DateType()),
    ),
    "fork": _s(
        _f("username", _STR),
        _f("repo", _STR),
        _f("created_at", _TS),
        _f("date", DateType()),
    ),
}

#: event type → table name routing (conversions dict, preprocess.py:112-119)
EVENT_TYPE_TO_TABLE = {
    "PushEvent": "commit",
    "CreateEvent": "create",
    "PullRequestEvent": "pr",
    "IssueCommentEvent": "comment",
    "WatchEvent": "watch",
    "ForkEvent": "fork",
}
