"""Keyset pagination with opaque tokens.

The reference pages DynamoDB with ``LastEvaluatedKey`` round-tripped as
base64(JSON) ``NextToken`` (assetService.py:760-804, common/dynamodb.py:
98-144). The Spark analog is keyset pagination: filter ``key > last``
then sort+limit — O(page) work per page instead of the offset-scan
O(offset+page), which is what survives at 100 TB (offset pagination
deep into a table forces a full ordered scan).
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def encode_page_token(last_key: dict[str, object]) -> str:
    return base64.b64encode(
        json.dumps(last_key, sort_keys=True, default=str).encode()
    ).decode()


def decode_page_token(token: str) -> dict[str, object]:
    return json.loads(base64.b64decode(token.encode()).decode())


def keyset_page_df(
    df: DataFrame,
    key_cols: list[str],
    page_size: int = 3000,
    token: str | None = None,
    descending: bool = False,
) -> DataFrame:
    """One page as a DataFrame (the declarative core of
    :func:`keyset_page`): boundary filter + sort + limit. The boundary
    predicate is a single struct row-comparison, pushable to the scan —
    page N costs O(page), not O(N·page)."""
    key_struct = F.struct(*[F.col(c) for c in key_cols])
    if token is not None:
        last = decode_page_token(token)
        types = {f.name: f.dataType for f in df.schema.fields}
        boundary = F.struct(
            *[F.lit(last[c]).cast(types[c]) for c in key_cols]
        )
        df = df.filter(
            key_struct < boundary if descending else key_struct > boundary
        )
    return df.orderBy(
        *[F.col(c).desc() if descending else F.col(c).asc() for c in key_cols]
    ).limit(page_size)


def keyset_page(
    df: DataFrame,
    key_cols: list[str],
    page_size: int = 3000,
    token: str | None = None,
    descending: bool = False,
) -> tuple[list, str | None]:
    """Return (rows, next_token) for one page ordered by ``key_cols``.

    Composite keys use lexicographic row-comparison via a struct —
    ``struct(k1, k2) > struct(v1, v2)`` is a single pushable predicate.
    Page defaults mirror validate_pagination_info (pageSize 3000).
    """
    key_struct = F.struct(*[F.col(c) for c in key_cols])
    if token is not None:
        last = decode_page_token(token)
        types = {f.name: f.dataType for f in df.schema.fields}
        boundary = F.struct(
            *[F.lit(last[c]).cast(types[c]) for c in key_cols]
        )
        df = df.filter(key_struct < boundary if descending else key_struct > boundary)
    ordered = df.orderBy(
        *[F.col(c).desc() if descending else F.col(c).asc() for c in key_cols]
    )
    rows = ordered.limit(page_size).collect()
    next_token = None
    if len(rows) == page_size:
        next_token = encode_page_token({c: rows[-1][c] for c in key_cols})
    return rows, next_token
