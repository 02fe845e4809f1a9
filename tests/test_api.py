"""Control-plane facade: catalog listing, roles, estimate/execute guard,
workflow endpoint (reference API surface, SURVEY.md §2.12)."""

import pytest

from geolake_spark.api import Catalog, Dataset, Product
from geolake_spark.plans.estimate import TooBigRequestError


@pytest.fixture()
def catalog(spark, synth_paths):
    cat = Catalog(spark)
    cat.add_product("era5", Product(
        "reanalysis", lambda s: s.read.parquet(synth_paths["obs"]),
        description="obs cube"))
    cat.add_product("webpages", Product(
        "pages", lambda s: s.read.parquet(synth_paths["pages"]),
        maximum_query_size_gb=10.0))
    cat.register(Dataset("secret", role="internal",
                         products={"p": Product(
                             "p", lambda s: s.read.parquet(synth_paths["obs"]))}))
    return cat


def test_listing_respects_roles(catalog):
    assert catalog.list_datasets() == ["era5", "webpages"]
    assert catalog.list_datasets(roles=["internal"]) == \
        ["era5", "secret", "webpages"]
    assert catalog.list_datasets(roles=["admin"]) == \
        ["era5", "secret", "webpages"]
    with pytest.raises(PermissionError):
        catalog.dataset_info("secret")


def test_product_metadata(catalog):
    md = catalog.product_metadata("era5", "reanalysis")
    assert ("value", "double") in md["schema"]
    assert md["maximum_query_size_gb"] == 10.0


def test_estimate_has_floor_and_units(catalog):
    out = catalog.estimate("era5", "reanalysis",
                           {"variable": ["tas"], "time": {"year": [2021]}})
    assert out["value"] >= 0.01 and out["bytes"] > 0


def test_execute_admits_and_runs(catalog):
    df = catalog.execute("era5", "reanalysis",
                         {"variable": ["tas"],
                          "time": {"start": "2021-03-01", "stop": "2021-03-02"}})
    assert df.count() > 0


def test_execute_rejects_too_big(catalog, spark, synth_paths):
    catalog.add_product("era5", Product(
        "tiny_cap", lambda s: s.read.parquet(synth_paths["obs"]),
        maximum_query_size_gb=1e-6))
    with pytest.raises(TooBigRequestError):
        catalog.execute("era5", "tiny_cap", {"variable": ["tas"]})


def test_workflow_endpoint(catalog):
    out = catalog.run_workflow([
        {"id": "s", "op": "subset",
         "args": {"dataset_id": "era5", "product_id": "reanalysis",
                  "query": {"variable": ["tas"], "time": {"year": [2021]}}}},
        {"id": "avg", "op": "average", "use": ["s"], "args": {"dim": "level"}},
    ])
    assert "level" not in out.columns and out.count() > 0
