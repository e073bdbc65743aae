"""Hierarchical geospatial cell index — pure Catalyst bit arithmetic.

The H3/S2 role (stable hierarchical cell ids for tiling, parent rollup,
neighbor disks) implemented as a deterministic equirectangular quadtree so
it needs **no native library and no UDF at all**: encode/parent/neighbors
are integer column expressions (whole-stage codegen, usable as Iceberg/
parquet partition values, and expressible in ANSI SQL for oracle parity).

Layout of a cell id (BIGINT):
    bits 58-62 : resolution r (0..28)
    bits 29-57 : iy  = floor((lat + 90) / 180 * 2^r)   clamped to 2^r - 1
    bits  0-28 : ix  = floor((lon + 180) / 360 * 2^r)  clamped to 2^r - 1

At resolution r the globe is a 2^r × 2^r grid (~156 km cells at r=8,
~600 m at r=16). ``cell_parent`` is two right-shifts; ``cell_disk``
explodes the 3×3 neighborhood with longitude wrap-around.

If the real ``h3`` package is importable, ``h3_cell_udf`` provides a
vectorized Arrow pandas-UDF encoder with the same column contract; the
engine's operators only require (key, parent, disk) semantics, so both
indexes are interchangeable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_RES = 28
_RES_SHIFT = 58
_IY_SHIFT = 29


def _clamped_index(coord: Column, offset: float, extent: float, res: int) -> Column:
    n = 1 << res
    raw = F.floor((coord + F.lit(offset)) / F.lit(extent) * F.lit(float(n))).cast("long")
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), raw))


def cell_encode(lon: Column | str, lat: Column | str, res: int) -> Column:
    """Cell id at resolution *res* from lon/lat degree columns."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution must be in [0, {MAX_RES}], got {res}")
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    ix = _clamped_index(lon, 180.0, 360.0, res)
    iy = _clamped_index(lat, 90.0, 180.0, res)
    return (
        F.shiftleft(F.lit(res).cast("long"), _RES_SHIFT)
        .bitwiseOR(F.shiftleft(iy, _IY_SHIFT))
        .bitwiseOR(ix)
    )


def cell_encode_sql(lon: str, lat: str, res: int) -> str:
    """ANSI-SQL text of :func:`cell_encode` (DuckDB-runnable oracle form)."""
    n = 1 << res
    ix = f"LEAST({n - 1}, GREATEST(0, CAST(FLOOR(({lon} + 180.0) / 360.0 * {n}.0) AS BIGINT)))"
    iy = f"LEAST({n - 1}, GREATEST(0, CAST(FLOOR(({lat} + 90.0) / 180.0 * {n}.0) AS BIGINT)))"
    return f"((CAST({res} AS BIGINT) << {_RES_SHIFT}) | ({iy} << {_IY_SHIFT}) | {ix})"


def cell_resolution(cell: Column | str) -> Column:
    cell = F.col(cell) if isinstance(cell, str) else cell
    return F.shiftright(cell, _RES_SHIFT).bitwiseAND(F.lit(31))


def cell_ix(cell: Column | str) -> Column:
    cell = F.col(cell) if isinstance(cell, str) else cell
    return cell.bitwiseAND(F.lit((1 << _IY_SHIFT) - 1))


def cell_iy(cell: Column | str) -> Column:
    cell = F.col(cell) if isinstance(cell, str) else cell
    return F.shiftright(cell, _IY_SHIFT).bitwiseAND(F.lit((1 << _RES_SHIFT - _IY_SHIFT) - 1))


def cell_parent(cell: Column | str, child_res: int, parent_res: int) -> Column:
    """Parent cell id at a coarser resolution — two right-shifts.

    This is the tile key for per-partition solves: ``groupBy(parent)``
    co-locates every child cell of a tile, and the same expression is an
    Iceberg partition transform (pure deterministic arithmetic).
    """
    if parent_res > child_res:
        raise ValueError("parent_res must be <= child_res")
    cell = F.col(cell) if isinstance(cell, str) else cell
    shift = child_res - parent_res
    ix = F.shiftright(cell_ix(cell), shift)
    iy = F.shiftright(cell_iy(cell), shift)
    return (
        F.shiftleft(F.lit(parent_res).cast("long"), _RES_SHIFT)
        .bitwiseOR(F.shiftleft(iy, _IY_SHIFT))
        .bitwiseOR(ix)
    )


def cell_center(cell: Column | str, res: int):
    """(lon, lat) of the cell center."""
    cell = F.col(cell) if isinstance(cell, str) else cell
    n = float(1 << res)
    lon = (cell_ix(cell).cast("double") + 0.5) / F.lit(n) * 360.0 - 180.0
    lat = (cell_iy(cell).cast("double") + 0.5) / F.lit(n) * 180.0 - 90.0
    return lon, lat


def cell_disk(cell: Column | str, res: int, ring: int = 1) -> Column:
    """Array column of the (2·ring+1)² cells around *cell* (incl. itself).

    Longitude wraps (ix mod 2^res); latitude clamps at the poles (no wrap,
    duplicate edge cells are deduplicated by ``array_distinct``). Built
    from ``transform(sequence(...))`` — pure Catalyst, explode-ready for
    halo joins.
    """
    cell = F.col(cell) if isinstance(cell, str) else cell
    n = 1 << res
    ix, iy = cell_ix(cell), cell_iy(cell)
    offsets = F.sequence(F.lit(-ring), F.lit(ring))
    res_bits = F.shiftleft(F.lit(res).cast("long"), _RES_SHIFT)
    neighbors = F.flatten(
        F.transform(
            offsets,
            lambda dy: F.transform(
                offsets,
                lambda dx: res_bits.bitwiseOR(
                    F.shiftleft(
                        F.least(F.lit(n - 1), F.greatest(F.lit(0), iy + dy)), _IY_SHIFT
                    )
                ).bitwiseOR(F.pmod(ix + dx, F.lit(n))),
            ),
        )
    )
    return F.array_distinct(neighbors)


def h3_cell_udf(res: int):
    """Optional real-H3 encoder (vectorized Arrow pandas UDF); only
    available when the ``h3`` package is installed."""
    try:
        import h3  # noqa: F401
    except ImportError as exc:  # pragma: no cover - h3 not in this container
        raise ImportError("the 'h3' package is not installed; use cell_encode instead") from exc
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def encode(lon: pd.Series, lat: pd.Series) -> pd.Series:
        import h3

        return pd.Series(
            [int(h3.latlng_to_cell(la, lo, res), 16) for lo, la in zip(lon, lat)],
            dtype="int64",
        )

    return encode
