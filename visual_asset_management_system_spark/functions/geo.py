"""Geo functions for the ``gp_`` (geo_point) search surface.

The reference maps dict metadata with lat+lon keys to OpenSearch
geo_point fields (models/indexing.py:58-106 `_determine_field_name_and
_type`; mapping :419-490) — the OpenSearch query surface over those
fields is geo_distance / geo_bounding_box filtering. Spark-side, a
geo point is a pair of double columns and the distance predicate is
pure Column trigonometry (codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine form — numerically stable
    for the small angles a radius filter cares about). Written as the
    same expression tree the SQL oracle uses, so both engines evaluate
    the identical double arithmetic; consumers grid-round before any
    comparison (the repo's float-boundary discipline)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))
