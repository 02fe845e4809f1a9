"""Library facade mirroring the reference's REST control plane as calls.

Endpoint -> function map (SURVEY.md §2.12; /root/reference/api/app/main.py):

* ``GET  /datasets``                         -> :meth:`Catalog.list_datasets`
* ``GET  /datasets/{d}``                     -> :meth:`Catalog.dataset_info`
* ``GET  /datasets/{d}/{p}/metadata``        -> :meth:`Catalog.product_metadata`
* ``POST /datasets/{d}/{p}/estimate``        -> :meth:`Catalog.estimate`
* ``POST /datasets/{d}/{p}/execute``         -> :meth:`Catalog.execute`
* ``POST /datasets/workflow``                -> :meth:`Catalog.run_workflow`

Role-based visibility follows the reference (datastore.py:396-416): a
dataset with a ``role`` is hidden unless the caller's roles include it or
the caller is "admin".  ``execute`` applies the estimate-then-admit guard
(dataset.py:253-267) before running; results return as lazy DataFrames
instead of files-on-a-volume (async jobs map to Spark's own scheduler).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from geolake_spark.model import GeoQuery, TaskList
from geolake_spark.operators import subset
from geolake_spark.plans import estimate as est
from geolake_spark.plans.workflow import Workflow


@dataclass
class Product:
    product_id: str
    loader: Callable[[SparkSession], DataFrame]
    description: str = ""
    maximum_query_size_gb: float = est.DEFAULT_MAX_REQUEST_SIZE_GB


@dataclass
class Dataset:
    dataset_id: str
    products: dict[str, Product] = field(default_factory=dict)
    description: str = ""
    role: str | None = None  # None = public (datastore.py:396-416)


class Catalog:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._datasets: dict[str, Dataset] = {}

    # -- registration (the intake-YAML analogue) -----------------------------

    def register(self, dataset: Dataset) -> None:
        self._datasets[dataset.dataset_id] = dataset

    def add_product(self, dataset_id: str, product: Product,
                    description: str = "", role: str | None = None) -> None:
        ds = self._datasets.setdefault(
            dataset_id, Dataset(dataset_id, description=description, role=role))
        ds.products[product.product_id] = product

    # -- read endpoints -------------------------------------------------------

    def _visible(self, ds: Dataset, roles: list[str] | None) -> bool:
        if ds.role is None:
            return True
        roles = roles or []
        return "admin" in roles or ds.role in roles

    def list_datasets(self, roles: list[str] | None = None) -> list[str]:
        return [d for d, ds in sorted(self._datasets.items())
                if self._visible(ds, roles)]

    def dataset_info(self, dataset_id: str,
                     roles: list[str] | None = None) -> dict:
        ds = self._datasets[dataset_id]
        if not self._visible(ds, roles):
            raise PermissionError(f"dataset {dataset_id!r} requires role "
                                  f"{ds.role!r}")
        return {"dataset_id": ds.dataset_id, "description": ds.description,
                "products": sorted(ds.products)}

    def product_metadata(self, dataset_id: str, product_id: str,
                         roles: list[str] | None = None) -> dict:
        ds = self._datasets[dataset_id]
        if not self._visible(ds, roles):
            raise PermissionError(dataset_id)
        p = ds.products[product_id]
        df = p.loader(self.spark)
        return {"product_id": p.product_id, "description": p.description,
                "schema": [(f.name, f.dataType.simpleString())
                           for f in df.schema.fields],
                "maximum_query_size_gb": p.maximum_query_size_gb}

    # -- query endpoints ------------------------------------------------------

    def _load(self, dataset_id: str, product_id: str,
              roles: list[str] | None) -> tuple[DataFrame, Product]:
        ds = self._datasets[dataset_id]
        if not self._visible(ds, roles):
            raise PermissionError(dataset_id)
        p = ds.products[product_id]
        return p.loader(self.spark), p

    def estimate(self, dataset_id: str, product_id: str,
                 query: GeoQuery | dict | str,
                 roles: list[str] | None = None) -> dict:
        """Metadata-only size estimate (datastore.py:363-394 + unit
        formatting with the 0.01 floor, api_utils.py:33-73)."""
        df, _ = self._load(dataset_id, product_id, roles)
        result = subset.subset(df, query)
        n = est.estimate_df_bytes(result)
        val, unit = est.human_size(n)
        return {"value": val, "units": unit, "bytes": n}

    def execute(self, dataset_id: str, product_id: str,
                query: GeoQuery | dict | str,
                roles: list[str] | None = None) -> DataFrame:
        """Estimate-then-execute with the GB admission guard
        (dataset.py:253-267); returns the lazy result DataFrame."""
        df, p = self._load(dataset_id, product_id, roles)
        result = subset.subset(df, query)
        est.admit(est.estimate_df_bytes(result),
                  max_gb=p.maximum_query_size_gb)
        return result

    def run_workflow(self, tasklist: TaskList | list | dict | str,
                     roles: list[str] | None = None) -> DataFrame:
        """TaskList execution (no size guard — faithful to dataset.py:300-358)."""
        def load(spark, dataset_id, product_id):
            df, _ = self._load(dataset_id, product_id, roles)
            return df
        wf = (Workflow(tasklist, load) if isinstance(tasklist, TaskList)
              else Workflow.from_json(tasklist, load))
        return wf.result(self.spark)
