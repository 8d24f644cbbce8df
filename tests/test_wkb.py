"""WKB geometry parsing (C6–C8; FIXTURES F03/F07)."""

import struct

from pyspark.sql import functions as F

from mysql_ch_replicator_spark.functions.wkb import (
    parse_wkb_multipolygon,
    parse_wkb_point,
    parse_wkb_polygon,
    wkb_point_udf,
    wkb_polygon_udf,
)


def wkb_point(x, y, little=True, srid=None):
    bo = "<" if little else ">"
    b = struct.pack(bo + "BIdd", 1 if little else 0, 1, x, y)
    if srid is not None:
        b = struct.pack("<I", srid) + b
    return b


def wkb_polygon(rings, little=True, srid=None):
    bo = "<" if little else ">"
    b = struct.pack(bo + "BII", 1 if little else 0, 3, len(rings))
    for ring in rings:
        b += struct.pack(bo + "I", len(ring))
        for x, y in ring:
            b += struct.pack(bo + "dd", x, y)
    if srid is not None:
        b = struct.pack("<I", srid) + b
    return b


def wkb_multipolygon(polys, little=True, srid=None):
    bo = "<" if little else ">"
    b = struct.pack(bo + "BII", 1 if little else 0, 6, len(polys))
    for rings in polys:
        b += wkb_polygon(rings, little)
    if srid is not None:
        b = struct.pack("<I", srid) + b
    return b


def test_point_both_endians_and_srid():
    assert parse_wkb_point(wkb_point(10.0, 20.0)) == {"x": 10.0, "y": 20.0}
    assert parse_wkb_point(wkb_point(10.0, 20.0, little=False)) == \
        {"x": 10.0, "y": 20.0}
    assert parse_wkb_point(wkb_point(-1.5, 2.5, srid=4326)) == \
        {"x": -1.5, "y": 2.5}
    assert parse_wkb_point(None) is None
    assert parse_wkb_point(wkb_point(1, 2).hex()) == {"x": 1.0, "y": 2.0}


def test_polygon_outer_ring_holes_skipped():
    outer = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    hole = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]
    got = parse_wkb_polygon(wkb_polygon([outer, hole], srid=0))
    assert [(p["x"], p["y"]) for p in got] == [(float(x), float(y))
                                              for x, y in outer]


def test_multipolygon_all_outer_rings():
    p1 = [[(0, 0), (1, 0), (1, 1), (0, 0)]]
    p2 = [[(5, 5), (6, 5), (6, 6), (5, 5)], [(5.2, 5.2), (5.4, 5.2), (5.4, 5.4), (5.2, 5.2)]]
    got = parse_wkb_multipolygon(wkb_multipolygon([p1, p2]))
    assert len(got) == 2
    assert len(got[0]) == 4 and len(got[1]) == 4  # holes skipped


def test_udfs_in_spark(spark):
    rows = [(1, wkb_point(10.0, 20.0, srid=0).hex(),
             wkb_polygon([[(0, 0), (1, 0), (1, 1), (0, 0)]]).hex()),
            (2, None, None)]
    df = spark.createDataFrame(rows, "id int, pt string, poly string")
    out = {r.id: r for r in df.select(
        "id",
        wkb_point_udf(F.col("pt")).alias("pt"),
        wkb_polygon_udf(F.col("poly")).alias("poly")).collect()}
    assert out[1].pt.x == 10.0 and out[1].pt.y == 20.0
    assert [(p.x, p.y) for p in out[1].poly] == [(0.0, 0.0), (1.0, 0.0),
                                                 (1.0, 1.0), (0.0, 0.0)]
    assert out[2].pt is None and out[2].poly is None
