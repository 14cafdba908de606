"""Unit semantics for the tier-34 spatial additions, on hand-built
frames where the expected answer is computable by eye —
complementing the DuckDB oracle gate (engine parity, not intent).

* geohash_encode: a known (lat, lon) encodes to the geohash computed
  by an independent pure-Python reference implementation; nearby
  points share a prefix.
* spatial_radius_join: three points placed so exactly one pair is
  within the radius — including a pair straddling a cell boundary
  (the adjacent-cell search must find it).
* spatial_cell_rollup: parent counts equal the sum of their child
  counts at every zoom level.
"""

import pytest

from etl_tool_rep_spark.queries import QUERIES

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_geohash(lat100: int, lon100: int) -> str:
    """Independent reference: standard geohash from quantized
    15-bit lat/lon (lon takes even bit positions from the top)."""
    latq = (lat100 + 9000) * 32768 // 18000
    lonq = (lon100 + 18000) * 32768 // 36000
    bits = []
    for i in range(15):
        bits.append((lonq >> (14 - i)) & 1)
        bits.append((latq >> (14 - i)) & 1)
    code = 0
    for b in bits:
        code = code * 2 + b
    return "".join(_B32[(code >> (25 - 5 * c)) & 31]
                   for c in range(6))


def _cust(spark, keys):
    return spark.createDataFrame([(k,) for k in keys],
                                 "c_custkey long")


def test_geohash_matches_reference(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier34 as t34
    keys = [1, 2, 77, 4096, 123456]
    monkeypatch.setattr(t34, "load",
                        lambda s, d, n: _cust(spark, keys))
    got = {r["c_custkey"]: r
           for r in QUERIES["geohash_encode"](spark, "x").collect()}
    for k in keys:
        lat100 = (k * k) % 17000 - 8500
        lon100 = ((k * k + k) * 101) % 36000 - 18000
        assert got[k]["geohash6"] == _ref_geohash(lat100, lon100)
        assert got[k]["lat"] == lat100 / 100.0
        assert got[k]["lon"] == lon100 / 100.0


def test_geohash_prefix_locality(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier34 as t34
    # nearby points share a prefix (only the lowest bits differ);
    # a far point diverges within the first two characters
    a = _ref_geohash(0, 0)
    b = _ref_geohash(1, 1)
    c = _ref_geohash(8000, 17000)
    assert a[:4] == b[:4]
    assert a[:2] != c[:2]


def test_radius_join_boundary_pair(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier34 as t34
    import etl_tool_rep_spark.queries.tier34 as m

    # bypass the synthetic mapping: monkeypatch load to a frame and
    # the coordinate expressions to pass-throughs of explicit cols
    pts = spark.createDataFrame(
        [(1, 95, 0), (2, 105, 0), (3, 500, 500)],
        "c_custkey long, px long, py long")
    monkeypatch.setattr(m, "_LON100", "px")
    monkeypatch.setattr(m, "_LAT100", "py")
    monkeypatch.setattr(t34, "load", lambda s, d, n: pts)
    got = QUERIES["spatial_radius_join"](spark, "x").collect()
    # points 1 and 2 are 10 apart but in DIFFERENT cells (95//100=0,
    # 105//100=1): only the adjacent-cell search finds them
    assert len(got) == 1
    r = got[0]
    assert (r["a_id"], r["b_id"]) == (1, 2)
    assert r["d2"] == 100


def test_cell_rollup_parent_sums(spark, monkeypatch):
    import etl_tool_rep_spark.queries.tier34 as t34
    keys = list(range(1, 400))
    monkeypatch.setattr(t34, "load",
                        lambda s, d, n: _cust(spark, keys))
    got = QUERIES["spatial_cell_rollup"](spark, "x").collect()
    by_zoom = {}
    for r in got:
        by_zoom.setdefault(r["zoom_bits"], {})[
            (r["gx"], r["gy"])] = r["n"]
    assert set(by_zoom) == {8, 6, 4}
    assert sum(by_zoom[8].values()) == 399
    # every zoom-6 parent equals the sum of its zoom-8 children
    for (gx, gy), n in by_zoom[6].items():
        kids = sum(v for (cx, cy), v in by_zoom[8].items()
                   if cx >> 2 == gx and cy >> 2 == gy)
        assert kids == n
    for (gx, gy), n in by_zoom[4].items():
        kids = sum(v for (cx, cy), v in by_zoom[6].items()
                   if cx >> 2 == gx and cy >> 2 == gy)
        assert kids == n
