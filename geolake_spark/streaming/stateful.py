"""Custom stateful streaming operators (applyInPandasWithState).

Engine extension beyond the reference (which has no streaming at all —
SURVEY.md §2.9): web-crawl ingest needs per-host running state that windowed
aggregation can't express:

* ``host_crawl_stats`` — per-host running page count, byte total, and first/
  last timestamps, updated incrementally across micro-batches with processing
  -time timeout eviction (the crawl-politeness bookkeeping a fetch scheduler
  reads).
* ``streaming_exact_dedup`` — drop pages whose text fingerprint was already
  seen for the host (state = seen-fingerprint set per host), i.e. exact
  dedup as a stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOST_STATS_OUTPUT = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("pages", T.LongType()),
    T.StructField("bytes", T.LongType()),
    T.StructField("first_ts", T.TimestampType()),
    T.StructField("last_ts", T.TimestampType()),
])
HOST_STATS_STATE = T.StructType([
    T.StructField("pages", T.LongType()),
    T.StructField("bytes", T.LongType()),
    T.StructField("first_ts", T.LongType()),   # epoch micros
    T.StructField("last_ts", T.LongType()),
])


def _host_stats_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    pages, nbytes, first_us, last_us = (state.get if state.exists
                                        else (0, 0, None, None))
    for pdf in pdfs:
        pages += len(pdf)
        nbytes += int(pdf["html"].map(len).sum())
        ts_us = (pdf["warc_ts"].astype("int64") // 1000).astype("int64")
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((pages, nbytes, first_us, last_us))
    yield pd.DataFrame([{
        "host": key[0], "pages": pages, "bytes": nbytes,
        "first_ts": pd.Timestamp(first_us * 1000),
        "last_ts": pd.Timestamp(last_us * 1000),
    }])


def host_crawl_stats(pages: DataFrame) -> DataFrame:
    """Streaming per-host running stats; emits the updated row per host per
    micro-batch (update mode)."""
    with_host = pages.withColumn(
        "host", F.regexp_extract("url", r"https?://([^/]+)/", 1))
    return (with_host
            .groupBy("host")
            .applyInPandasWithState(
                _host_stats_fn, HOST_STATS_OUTPUT, HOST_STATS_STATE,
                "update", GroupStateTimeout.NoTimeout))


DEDUP_OUTPUT = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("fp", T.StringType()),
])
DEDUP_STATE = T.StructType([
    T.StructField("seen", T.ArrayType(T.StringType())),
])


# Per-host seen-set cap: at 100 TB the state store is the scaling limit of
# any streaming dedup — an unbounded set per host grows forever.  The cap
# keeps the newest fingerprints (crawl repeats cluster in time, so recency
# is the right eviction), and an optional processing-time TTL drops idle
# hosts outright.
DEDUP_MAX_STATE = 100_000


def _make_dedup_fn(max_state: int, ttl_ms: int | None):
    def _dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
        import hashlib
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=["host", "url", "fp"])
            return
        seen_list = list(state.get[0]) if state.exists else []
        seen = set(seen_list)
        out = []
        for pdf in pdfs:
            fps = [hashlib.md5(t.encode()).hexdigest() for t in pdf["text"]]
            for url, fp in zip(pdf["url"], fps):
                if fp not in seen:
                    seen.add(fp)
                    seen_list.append(fp)  # insertion order = recency order
                    out.append({"host": key[0], "url": url, "fp": fp})
        if len(seen_list) > max_state:
            seen_list = seen_list[-max_state:]
        state.update((seen_list,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=["host", "url", "fp"])
    return _dedup_fn


def streaming_exact_dedup(pages: DataFrame,
                          max_state: int = DEDUP_MAX_STATE,
                          ttl_minutes: float | None = None) -> DataFrame:
    """First occurrence of each (host, text-fingerprint) survives; repeats —
    including across micro-batches — are dropped via per-host state.

    State is BOUNDED: at most ``max_state`` fingerprints per host (oldest
    evicted — an evicted repeat re-emits, the stated trade for bounded
    memory), and with ``ttl_minutes`` idle hosts are evicted wholesale via
    processing-time timeout."""
    with_host = pages.withColumn(
        "host", F.regexp_extract("url", r"https?://([^/]+)/", 1))
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_minutes is not None else GroupStateTimeout.NoTimeout)
    ttl_ms = int(ttl_minutes * 60_000) if ttl_minutes is not None else None
    return (with_host
            .groupBy("host")
            .applyInPandasWithState(
                _make_dedup_fn(max_state, ttl_ms), DEDUP_OUTPUT, DEDUP_STATE,
                "append", timeout))  # emits new rows only
