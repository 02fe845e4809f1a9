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


# ---------------------------------------------------------------------------
# Filename-pattern sources (reference drivers/intake_geokube/netcdf.py:8-60
# `pattern` arg; drivers/tests/resources/test_catalog.yaml:20): name parts
# like ``{var}_ens_spread_{res}deg.nc`` lift into attribute columns, and
# attribute filters prune FILES before any scan — the foreign-file-drop
# analogue of partition pruning.
# ---------------------------------------------------------------------------


def pattern_regex(pattern: str) -> tuple[str, list[str]]:
    """``{var}_ens_spread_{res}deg.nc`` -> (anchored regex with one group
    per field, field names).  Fields match non-greedily so literal
    separators between them bind first."""
    import re
    fields: list[str] = []
    parts: list[str] = []
    i = 0
    for m in re.finditer(r"\{(\w+)\}", pattern):
        parts.append(re.escape(pattern[i:m.start()]))
        parts.append("(.*?)")
        fields.append(m.group(1))
        i = m.end()
    parts.append(re.escape(pattern[i:]))
    return "^" + "".join(parts) + "$", fields


def read_patterned(spark, directory: str, pattern: str,
                   fmt: str = "parquet",
                   attr_filters: dict | None = None) -> DataFrame:
    """Read a directory of pattern-named files with name parts as columns.

    * files are enumerated and matched DRIVER-SIDE; ``attr_filters``
      ({field: value-or-list}) drops non-matching files before Spark ever
      sees them — scan-level pruning exactly like the reference's
      partition-attribute handling (unknown filter keys are ignored here
      and applied row-level by the subset operator downstream);
    * the surviving files load as ONE multi-path scan (full parallelism,
      not a union of per-file plans);
    * attribute columns derive from ``input_file_name()`` via a JVM
      ``regexp_extract`` on the basename — ordinary codegen columns, no
      Python in the scan path.
    """
    import os
    import re
    regex, fields = pattern_regex(pattern)
    rx = re.compile(regex)
    chosen = []
    for fn in sorted(os.listdir(directory)):
        m = rx.match(fn)
        if not m:
            continue
        attrs = dict(zip(fields, m.groups()))
        keep = True
        for k, v in (attr_filters or {}).items():
            if k in attrs:
                allowed = (v if isinstance(v, (list, tuple, set)) else [v])
                if attrs[k] not in {str(x) for x in allowed}:
                    keep = False
                    break
        if keep:
            chosen.append(os.path.join(directory, fn))
    if not chosen:
        raise FileNotFoundError(
            f"no files under {directory} match pattern {pattern!r} "
            f"with filters {attr_filters}")
    df = spark.read.format(fmt).load(chosen)
    base = F.element_at(F.split(F.input_file_name(), "/"), -1)
    for i, name in enumerate(fields):
        df = df.withColumn(name, F.regexp_extract(base, regex, i + 1))
    return df
