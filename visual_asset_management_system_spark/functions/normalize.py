"""Scalar normalization / coercion helpers.

Re-expresses the reference's value-normalization semantics as pure
Column expressions (JVM-side, codegen-friendly — never Python UDFs):

- field-name sanitization:  models/indexing.py:16-54
- boolean literal coercion: handlers/indexing/assetIndexer.py:204-211
- numeric try-int-then-float: assetIndexer.py:261-273
- composite keys ``a:b:c``:  assetIndexer.py:346, 880-890
- file path ops (extension, folder detection): fileIndexer.py:603-611,
  assetFiles.py:1074-1101
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRUE_LITERALS = ("true", "1", "yes", "on")
_FALSE_LITERALS = ("false", "0", "no", "off")


def sanitize_field_name(name: str) -> str:
    """Sanitize a user metadata key into a legal column/field name.

    Mirrors models/indexing.py:16-54: lowercase, spaces→underscores,
    strip anything outside ``[a-z0-9_-]``, no leading underscores/digits,
    max 255 chars, ``field_`` prefix when empty.
    Runs planner-side (driver), so plain Python is correct here.
    """
    s = (name or "").lower().replace(" ", "_")
    s = re.sub(r"[^a-z0-9_-]", "", s)
    s = s.lstrip("_")
    if not s or s[0].isdigit():
        s = "field_" + s
    return s[:255]


def coerce_boolean(col: Column) -> Column:
    """String → boolean using the reference's literal sets (true/1/yes/on)."""
    lowered = F.lower(F.trim(col))
    return (
        F.when(lowered.isin(*_TRUE_LITERALS), F.lit(True))
        .when(lowered.isin(*_FALSE_LITERALS), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def coerce_number(col: Column) -> Column:
    """String → number with try-int-then-float semantics (as double)."""
    return F.coalesce(
        col.try_cast("long").cast("double"),
        col.try_cast("double"),
    )


def composite_key(*cols: Column | str, sep: str = ":") -> Column:
    """Build the reference's ``a:b:c`` composite key (compat shim only —
    real plans keep the parts as first-class columns)."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def split_composite_key(col: Column, n: int, sep: str = ":") -> list[Column]:
    """Split ``a:b:c`` into n columns (``split(':', n-1)`` semantics)."""
    parts = F.split(col, re.escape(sep), n)
    return [parts.getItem(i) for i in range(n)]


def url_decode_key(col: Column) -> Column:
    """URL-decode an S3 object key with ``unquote_plus`` semantics
    (fileIndexer.py:876: ``urllib.parse.unquote_plus(s3_key)``) —
    Spark's ``url_decode`` is application/x-www-form-urlencoded
    decoding ('+' → space, %XX → byte), JVM-side. But where
    ``unquote_plus`` leaves malformed percent-escapes (``x%zz``)
    untouched, plain ``url_decode`` raises CANNOT_DECODE_URL — one bad
    key would abort the whole query or CDC batch — so decode with
    ``try_url_decode`` and fall back to the raw key on failure.
    (Divergence is confined to malformed keys: ``unquote_plus`` would
    still decode the valid escapes around the bad one, the fallback
    keeps the whole key raw — a deliberate, crash-free approximation.)
    """
    return F.coalesce(F.try_url_decode(col), col)


def parse_flexible_date(col: Column) -> Column:
    """Lenient ISO date/timestamp parse (models/indexing.py:100-123
    ``_is_date_string`` + fromisoformat with Z and sub-second handling):
    accepts date-only, space or 'T' separators, trailing 'Z', and any
    sub-second precision (nanoseconds truncate to microseconds in the
    cast). NULL when unparseable — callers keep the raw string then."""
    return F.coalesce(
        col.try_cast("timestamp"),
        # strip a fractional-seconds group the cast rejected, retry
        F.regexp_replace(col, r"\.\d+", "").try_cast("timestamp"),
        col.try_cast("date").cast("timestamp"),
    )


def json_blob_get(col: Column, path: str) -> Column:
    """Extract a scalar from a ``gs_``-style JSON blob column
    (models/indexing.py:94-97 stores non-geo dict metadata as JSON
    strings; search filters reach into them). ``path`` is a ``$.a.b``
    JSONPath; returns string, NULL on missing/invalid."""
    return F.get_json_object(col, path)


def file_extension(key: Column) -> Column:
    """Lowercased extension of the last path segment, '' when none."""
    base = F.element_at(F.split(key, "/"), -1)
    ext = F.when(base.contains("."), F.lower(F.element_at(F.split(base, r"\."), -1)))
    return F.coalesce(ext, F.lit(""))


def is_folder(key: Column) -> Column:
    """Folder iff trailing '/' or no '.' in the basename."""
    base = F.element_at(F.split(key, "/"), -1)
    return key.endswith("/") | ~base.contains(".")
