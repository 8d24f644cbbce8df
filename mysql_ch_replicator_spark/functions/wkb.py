"""WKB geometry parsing — C6/C7/C8 of SURVEY.md §2.4.

MySQL's internal geometry format is ``4-byte SRID prefix + WKB``; plain WKB
(no SRID) also occurs on the binlog path. Both endians supported (reference
converter.py:86–271). Output types:

- point        → struct<x: double, y: double>
- polygon      → array<struct<x,y>>            (outer ring only)
- multipolygon → array<array<struct<x,y>>>     (outer ring of each polygon)

This is genuinely non-expressible with built-in Spark functions, so it is a
**Pandas UDF** (Arrow-batched, ~100× the throughput of a row-at-a-time
Python UDF — the only Python in the conversion hot path).
"""

from __future__ import annotations

import struct as _struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..schema.type_mapping import MULTIPOLYGON_TYPE, POINT_TYPE, POLYGON_TYPE

_WKB_POINT = 1
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def _to_bytes(v) -> bytes | None:
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    s = str(v)
    if s.startswith("0x") or s.startswith("0X"):
        s = s[2:]
    try:
        return bytes.fromhex(s)
    except ValueError:
        return None


class _Reader:
    __slots__ = ("buf", "pos", "bo")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.bo = "<"

    def skip_srid_if_present(self, expect_type: int) -> None:
        # MySQL internal format: 4-byte SRID, then WKB. Detect by checking
        # whether byte 4 is a valid byte-order mark with a sane geom type.
        b = self.buf
        if len(b) >= 9 and b[4] in (0, 1):
            bo = "<" if b[4] == 1 else ">"
            (gt,) = _struct.unpack_from(bo + "I", b, 5)
            if gt == expect_type:
                self.pos = 4
                return
        self.pos = 0

    def read_header(self) -> int:
        bo_byte = self.buf[self.pos]
        self.bo = "<" if bo_byte == 1 else ">"
        (gt,) = _struct.unpack_from(self.bo + "I", self.buf, self.pos + 1)
        self.pos += 5
        return gt

    def read_u32(self) -> int:
        (v,) = _struct.unpack_from(self.bo + "I", self.buf, self.pos)
        self.pos += 4
        return v

    def read_xy(self) -> tuple[float, float]:
        x, y = _struct.unpack_from(self.bo + "dd", self.buf, self.pos)
        self.pos += 16
        return x, y


def parse_wkb_point(raw) -> dict | None:
    b = _to_bytes(raw)
    if not b:
        return None
    r = _Reader(b)
    r.skip_srid_if_present(_WKB_POINT)
    if r.read_header() != _WKB_POINT:
        return None
    x, y = r.read_xy()
    return {"x": x, "y": y}


def _read_polygon_outer_ring(r: _Reader) -> list[dict]:
    n_rings = r.read_u32()
    ring: list[dict] = []
    for ring_idx in range(n_rings):
        n_pts = r.read_u32()
        for _ in range(n_pts):
            x, y = r.read_xy()
            if ring_idx == 0:  # holes skipped (reference converter.py:187–271)
                ring.append({"x": x, "y": y})
    return ring


def parse_wkb_polygon(raw) -> list | None:
    b = _to_bytes(raw)
    if not b:
        return None
    r = _Reader(b)
    r.skip_srid_if_present(_WKB_POLYGON)
    if r.read_header() != _WKB_POLYGON:
        return None
    return _read_polygon_outer_ring(r)


def parse_wkb_multipolygon(raw) -> list | None:
    b = _to_bytes(raw)
    if not b:
        return None
    r = _Reader(b)
    r.skip_srid_if_present(_WKB_MULTIPOLYGON)
    if r.read_header() != _WKB_MULTIPOLYGON:
        return None
    n_polys = r.read_u32()
    out = []
    for _ in range(n_polys):
        # each polygon has its own byte-order + type header
        if r.read_header() != _WKB_POLYGON:
            return None
        out.append(_read_polygon_outer_ring(r))
    return out


@pandas_udf(POINT_TYPE)
def _wkb_point_inner(s: pd.Series) -> pd.DataFrame:
    vals = [parse_wkb_point(v) for v in s]
    return pd.DataFrame(
        {"x": [v["x"] if v else None for v in vals],
         "y": [v["y"] if v else None for v in vals]})


def wkb_point_udf(col: Column) -> Column:
    # struct-returning pandas UDFs can't express a NULL struct (only a
    # struct of NULL fields) — mask NULL inputs at the expression level
    return (F.when(col.isNull(), F.lit(None).cast(POINT_TYPE.simpleString()))
            .otherwise(_wkb_point_inner(col)))


@pandas_udf(POLYGON_TYPE)
def wkb_polygon_udf(s: pd.Series) -> pd.Series:
    return s.map(parse_wkb_polygon)


@pandas_udf(MULTIPOLYGON_TYPE)
def wkb_multipolygon_udf(s: pd.Series) -> pd.Series:
    return s.map(parse_wkb_multipolygon)


def wkb_parse_expr(col: Column, base_type: str) -> Column:
    if base_type == "point":
        return wkb_point_udf(col)
    if base_type == "polygon":
        return wkb_polygon_udf(col)
    if base_type == "multipolygon":
        return wkb_multipolygon_udf(col)
    raise ValueError(base_type)
