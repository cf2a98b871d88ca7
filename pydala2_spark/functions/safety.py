"""Input-hygiene helpers for the SQL/path surfaces.

Capability parity with the reference's security utilities
(`/root/reference/pydala/helpers/security.py:23-216`) re-expressed for
Spark: identifiers are backtick-quoted (Spark SQL dialect, not the
ANSI double-quote the reference targets for DuckDB), and path checks
speak both local paths and Hadoop-style URIs. These guard the places
where user strings reach an interpreter: catalog table names in
``spark.sql``, filter strings in ``Dataset.filter``, partition
values that become directory names.
"""

from __future__ import annotations

import posixpath
import re
from datetime import date, datetime
from typing import Any

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_PART_NAME_RE = re.compile(r"^[A-Za-z0-9_-]{1,255}$")
_SCHEME_RE = re.compile(r"^[a-z][a-z0-9+.-]*://", re.IGNORECASE)


def quote_identifier(name: str) -> str:
    """Backtick-quote a SQL identifier for Spark SQL, rejecting
    anything that is not a plain identifier (defense before quoting:
    a name that needs creative quoting is a name we refuse)."""
    if not name or not _IDENT_RE.match(name):
        raise ValueError(f"not a valid SQL identifier: {name!r}")
    return f"`{name}`"


def sql_literal(value: Any) -> str:
    """Render a Python value as a safe Spark SQL literal."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, datetime):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    if isinstance(value, date):
        return f"DATE '{value.isoformat()}'"
    text = str(value).replace("'", "''")
    return f"'{text}'"


def check_predicate(expr: str) -> str:
    """Hygiene pass for a user-supplied filter string before it reaches
    ``DataFrame.filter``: strips SQL comments, normalizes control
    characters, and rejects unbalanced quoting."""
    cleaned = expr.replace("\x00", "")
    cleaned = re.sub(r"--[^\n]*", " ", cleaned)
    cleaned = re.sub(r"/\*.*?\*/", " ", cleaned, flags=re.DOTALL)
    cleaned = re.sub(r"\s+", " ", cleaned).strip()
    if cleaned.count("'") % 2:
        raise ValueError("unbalanced single quotes in filter expression")
    return cleaned


def valid_partition_name(name: str) -> bool:
    """Hive partition *column* names: conservative charset, bounded."""
    return bool(_PART_NAME_RE.match(name or ""))


def valid_partition_value(value: Any) -> bool:
    """Hive partition *values* become path segments — refuse anything
    that could traverse or corrupt the directory layout."""
    if value is None or isinstance(value, (bool, int, float)):
        return True
    if not isinstance(value, str) or len(value) > 1024:
        return False
    return not any(tok in value for tok in ("..", "/", "\\", "\x00", "\n", "\r"))


def split_scheme(path: str) -> tuple[str | None, str]:
    """('s3a', 'bucket/key') for URIs, (None, path) for local paths."""
    m = _SCHEME_RE.match(path or "")
    if not m:
        return None, path
    scheme = m.group(0)[:-3]
    return scheme, path[m.end():]


def safe_child_path(base: str, *parts: str) -> str:
    """Join path components under ``base``, guaranteeing the result
    cannot escape it (the reference's ``safe_join``). Understands
    Hadoop URIs: the scheme survives, the containment check runs on
    the path part."""
    if not base:
        raise ValueError("base path cannot be empty")
    scheme, root = split_scheme(base)
    for p in parts:
        if not p or p.startswith(("/", "\\")) or "\x00" in p:
            raise ValueError(f"invalid path component: {p!r}")
    joined = posixpath.normpath(posixpath.join(root, *parts))
    root_norm = posixpath.normpath(root)
    if joined != root_norm and not joined.startswith(root_norm.rstrip("/") + "/"):
        raise ValueError(f"path escapes base directory: {posixpath.join(*parts)}")
    return f"{scheme}://{joined}" if scheme else joined
