"""Workflow DAG runner vs the reference JSON fixtures
(/root/reference/datastore/tests/workflow/fixtures.py:44-122 shapes)."""

import pytest

from geolake_spark.model import GeoQueryError, TaskList
from geolake_spark.plans.workflow import Workflow


@pytest.fixture(scope="module")
def load_product(synth_paths):
    def load(spark, dataset_id, product_id):
        return spark.read.parquet(synth_paths["obs"])
    return load


WORKFLOW_JSON = [
    # mirrors fixtures.py:57-88 (subset -> resample nanmax 1D closed=right)
    {"id": "first_task", "op": "subset",
     "args": {"dataset_id": "era5", "product_id": "reanalysis",
              "query": {"variable": ["tas"],
                        "time": {"year": [2021], "month": [3]}}}},
    {"id": "second_task", "op": "resample", "use": ["first_task"],
     "args": {"freq": "1D", "operator": "nanmax",
              "resample_args": {"closed": "right"},
              "keys": ["lat", "lon", "level", "var"],
              }},
]


def test_linear_chain(spark, load_product):
    wf = Workflow.from_json(WORKFLOW_JSON, load_product)
    out = wf.result(spark)
    assert "bucket_start" in out.columns
    assert out.count() > 0
    # daily buckets only within March 2021
    months = {r[0] for r in
              out.selectExpr("month(bucket_start)").distinct().collect()}
    assert months <= {2, 3}  # closed=right may pull the Feb 28 boundary bucket


def test_undefined_dependency_raises(load_product):
    # fixtures.py:91-122 — dependency on missing 'subset2' must fail verify
    bad = [
        {"id": "subset1", "op": "subset", "args": {}},
        {"id": "resample1", "op": "resample", "use": ["subset2"],
         "args": {"freq": "1D", "operator": "nanmax"}},
    ]
    with pytest.raises(GeoQueryError, match="undefined"):
        Workflow.from_json(bad, load_product)


def test_cycle_raises(load_product):
    tl = [
        {"id": "a", "op": "average", "use": ["b"], "args": {"dim": "ts"}},
        {"id": "b", "op": "average", "use": ["a"], "args": {"dim": "ts"}},
    ]
    with pytest.raises(GeoQueryError, match="DAG"):
        Workflow.from_json(tl, load_product)


def test_branching_dag_uses_declared_deps(spark, load_product, synth_paths):
    """The W6 fix: a diamond DAG must wire declared deps, not topo-previous."""
    wf = Workflow.from_json([
        {"id": "src", "op": "subset",
         "args": {"query": {"variable": ["tas"], "time": {"year": [2021]}}}},
        {"id": "avg_level", "op": "average", "use": ["src"],
         "args": {"dim": "level"}},
        {"id": "daily", "op": "resample", "use": ["src"],
         "args": {"freq": "1D", "operator": "nanmean",
                  "keys": ["lat", "lon", "level", "var"]}},
    ], load_product)
    res = wf.compute(spark)
    assert set(res) == {"src", "avg_level", "daily"}
    # avg_level collapsed 'level'; daily kept it
    assert "level" not in res["avg_level"].columns
    assert "level" in res["daily"].columns


def test_custom_op_registration(spark, load_product):
    wf = Workflow.from_json([
        {"id": "src", "op": "subset", "args": {"query": {"variable": ["pr"]}}},
        {"id": "x", "op": "double_it", "use": ["src"]},
    ], load_product)
    wf.register("double_it", lambda df: df.selectExpr("value * 2 as value2"))
    out = wf.result(spark)
    assert out.columns == ["value2"]


def test_to_tiles_node(spark, synth_paths):
    def load(spark_, d, p):
        return spark_.read.parquet(synth_paths["pages"])
    wf = Workflow.from_json([
        {"id": "src", "op": "subset", "args": {"query": {"lang": "en"}}},
        {"id": "tiles", "op": "to_tiles", "use": ["src"], "args": {"zoom": 5}},
    ], load)
    out = wf.result(spark)
    assert {"tile_z", "tile_x", "tile_y", "page_count"} <= set(out.columns)
    assert out.count() > 0


def test_curate_node(spark, synth_paths):
    """the webtext curation pipeline as a DAG node: subset -> curate,
    args pass through as JSON."""
    def load(spark_, d, p):
        return spark_.read.parquet(synth_paths["pages"])
    wf = Workflow.from_json([
        {"id": "src", "op": "subset", "args": {"query": {}}},
        {"id": "clean", "op": "curate", "use": ["src"],
         "args": {"id_col": "url", "langs": ["en"],
                  "min_quality": 0.1, "near_threshold": None}},
    ], load)
    out = wf.result(spark)
    from geolake_spark.operators import dedup
    n = out.count()
    dedup.release_caches()
    assert n > 0
    assert "quality" in out.columns
    assert out.filter("lang <> 'en'").count() == 0
