"""Source-adapter normalization chain (reference WRF/NetCDF preprocessing).

Mirrors the reference driver's per-file pipeline
(/root/reference/drivers/intake_geokube/wrf.py:35-97) as DataFrame
transforms:

* ``rename_coords`` — XTIME/XLAT/XLONG -> time/latitude/longitude-style
  renames from a mapping (wrf.py:35-44; catalog ``mapping`` arg,
  netcdf.py:22).
* ``collapse_curvilinear`` — 2-d curvilinear lat/lon collapsed to 1-d axes
  by row/column mean (wrf.py:47-63): every (i, j) point's lat is replaced by
  the mean lat of its row i, lon by the mean lon of its column j.
* ``choose_variables`` — keep/skip variable sets (wrf.py:82-97).
* ``add_projection`` — attach the CRS as metadata (wrf.py:66-79:
  grid_mapping_name latitude_longitude == EPSG:4326 here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CRS = "EPSG:4326"


def rename_coords(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """{old_name: new_name} column renames; missing olds are ignored
    (schema-on-read tolerance, netcdf.py:22 mapping semantics)."""
    for old, new in mapping.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df


def collapse_curvilinear(df: DataFrame, row_col: str = "i", col_col: str = "j",
                         lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Replace 2-d curvilinear coordinates with their 1-d axis means —
    window averages over the grid-row / grid-column (no driver collect)."""
    w_row = Window.partitionBy(row_col)
    w_col = Window.partitionBy(col_col)
    return (df.withColumn(lat_col, F.avg(lat_col).over(w_row))
            .withColumn(lon_col, F.avg(lon_col).over(w_col)))


def choose_variables(df: DataFrame, variables: list[str] | None = None,
                     skip: list[str] | None = None,
                     var_col: str = "var") -> DataFrame:
    """Keep or drop variable sets (mutually exclusive like the reference,
    wrf.py:82-97).  Long-form tables filter on the var column; wide tables
    prune columns."""
    if variables is not None and skip is not None:
        raise ValueError("variables and skip are mutually exclusive")
    if var_col in df.columns:
        if variables is not None:
            return df.filter(F.col(var_col).isin(variables))
        if skip is not None:
            return df.filter(~F.col(var_col).isin(skip))
        return df
    keys = [c for c in df.columns]
    if variables is not None:
        keep = [c for c in keys if c in variables or c in
                ("ts", "lat", "lon", "level")]
        return df.select(*keep)
    if skip is not None:
        return df.select(*[c for c in keys if c not in skip])
    return df


def add_projection(df: DataFrame, crs: str = CRS) -> DataFrame:
    """Attach the CRS as a constant metadata column (the reference attaches
    a grid-mapping coordinate; a table property serves the same contract)."""
    return df.withColumn("crs", F.lit(crs))
