"""DAG-of-operators runner (reference Workflow, fixed).

Reimplements /root/reference/datastore/workflow/workflow.py:64-217 with one
deliberate fix (SURVEY.md §2.11 W6): the reference's ``compute()`` threads a
*single* result through topological order — each task receives the previous
topo task's output rather than its declared dependencies', silently
mis-wiring any non-linear DAG.  Here every task receives exactly its
declared ``use`` inputs from a dict[task_id -> DataFrame]; behavior on linear
chains (all the reference can actually run) is identical.

Verification mirrors the reference: unique ids (task.py:26-31), every
dependency defined, acyclic (workflow.py:184-205).
"""

from __future__ import annotations

from collections.abc import Callable
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession

from geolake_spark.model import GeoQuery, GeoQueryError, Task, TaskList
from geolake_spark.operators import aggregates, subset, tiles


class Workflow:
    """ops: subset / resample / average / to_tiles (≅ to_regular) + custom
    registered callables (reference add_task, workflow.py:169-182)."""

    def __init__(self, tasklist: TaskList,
                 load_product: Callable[[SparkSession, str, str], DataFrame]):
        self.tasklist = tasklist
        self.load_product = load_product
        self.custom_ops: dict[str, Callable] = {}
        self.verify()

    @classmethod
    def from_json(cls, payload, load_product) -> "Workflow":
        return cls(TaskList.parse(payload), load_product)

    def register(self, name: str, fn: Callable[..., DataFrame]) -> None:
        self.custom_ops[name] = fn

    def verify(self) -> None:
        ids = {t.id for t in self.tasklist.tasks}
        for t in self.tasklist.tasks:
            for dep in t.use:
                if dep not in ids:  # undefined-dependency fixture (fixtures.py:91-122)
                    raise GeoQueryError(f"task {t.id!r} uses undefined task {dep!r}")
        ts = TopologicalSorter({t.id: set(t.use) for t in self.tasklist.tasks})
        try:
            self.order = list(ts.static_order())
        except Exception as exc:  # CycleError
            raise GeoQueryError(f"workflow is not a DAG: {exc}") from exc

    def _run_task(self, spark: SparkSession, task: Task,
                  inputs: list[DataFrame]) -> DataFrame:
        op, args = task.op, dict(task.args)
        if op == "subset":
            dataset_id = args.pop("dataset_id", None)
            product_id = args.pop("product_id", None)
            df = self.load_product(spark, dataset_id, product_id)
            return subset.subset(df, GeoQuery.parse(args.get("query", args)))
        if op == "resample":
            resample_args = args.pop("resample_args", {}) or {}
            return aggregates.resample(
                inputs[0], operator=args["operator"], frequency=args["freq"],
                closed=resample_args.get("closed", "left"),
                **{k: v for k, v in args.items() if k in ("value_col", "ts_col", "keys")})
        if op == "average":
            return aggregates.average(inputs[0], dim=args["dim"])
        if op in ("to_tiles", "to_regular"):
            return tiles.rollup_tiles(inputs[0], zoom=int(args.get("zoom", 8)))
        if op == "curate":
            # the webtext curation pipeline as a first-class DAG node:
            # args pass through to pipeline.curate_pages (langs,
            # min_quality, near_threshold, ... — JSON-serializable)
            from geolake_spark.pipeline import curate_pages
            return curate_pages(inputs[0], **args)
        if op in self.custom_ops:
            return self.custom_ops[op](*inputs, **args)
        raise GeoQueryError(f"unknown operator {op!r}")

    def compute(self, spark: SparkSession) -> dict[str, DataFrame]:
        by_id = {t.id: t for t in self.tasklist.tasks}
        results: dict[str, DataFrame] = {}
        for tid in self.order:
            task = by_id[tid]
            results[tid] = self._run_task(
                spark, task, [results[d] for d in task.use])
        return results

    def result(self, spark: SparkSession) -> DataFrame:
        """The last topological task's output (reference return contract,
        workflow.py:207-217)."""
        return self.compute(spark)[self.order[-1]]
