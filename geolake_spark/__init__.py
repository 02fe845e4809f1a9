"""geolake_spark — a from-scratch PySpark-native geospatial lakehouse engine.

Re-expresses the capabilities of km4rcus/geolake (declarative geo-queries,
partition-pruned scans, spatial subsetting, nearest/kNN selection, temporal
resample, regrid/tiling, DAG workflows, estimate-then-execute, resumable
snapshot writes) as an idiomatic Spark DataFrame library — NOT a port of its
FastAPI/RabbitMQ/Dask microservices (SURVEY.md §7).
"""

__version__ = "0.1.0"
