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


NEARDUP_OUTPUT = T.StructType([
    T.StructField("id_a", T.StringType()),
    T.StructField("id_b", T.StringType()),
    T.StructField("sig_sim", T.DoubleType()),
])
NEARDUP_STATE = T.StructType([
    T.StructField("ids", T.ArrayType(T.StringType())),
    T.StructField("sigs", T.ArrayType(T.ArrayType(T.LongType()))),
])


def _make_neardup_fn(num_perm: int, threshold: float, max_state: int,
                     ttl_ms: int | None):
    def _neardup_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=["id_a", "id_b", "sig_sim"])
            return
        if state.exists:
            ids, sigs = list(state.get[0]), [list(s) for s in state.get[1]]
        else:
            ids, sigs = [], []
        mat = (np.asarray(sigs, dtype=np.int64) if sigs
               else np.zeros((0, num_perm), dtype=np.int64))
        pos = {d: i for i, d in enumerate(ids)}
        out = []
        for pdf in pdfs:
            for doc_id, sig in zip(pdf["id"], pdf["minhash"]):
                doc_id = str(doc_id)
                v = np.asarray(list(sig), dtype=np.int64)
                if len(mat):
                    sim = (mat == v[None, :]).mean(axis=1)
                    for j in np.nonzero(sim >= threshold)[0]:
                        if ids[j] == doc_id:  # recrawl/replay: no self-pair
                            continue
                        a, b = sorted((ids[j], doc_id))
                        out.append({"id_a": a, "id_b": b,
                                    "sig_sim": round(float(sim[j]), 6)})
                if doc_id in pos:  # recrawl overwrites its stored signature
                    mat[pos[doc_id]] = v
                else:
                    pos[doc_id] = len(ids)
                    ids.append(doc_id)
                    mat = np.vstack([mat, v[None, :]])
        if len(ids) > max_state:  # recency eviction, like exact dedup
            ids = ids[-max_state:]
            mat = mat[-max_state:]
        state.update((ids, [[int(x) for x in row] for row in mat]))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=["id_a", "id_b", "sig_sim"])
    return _neardup_fn


def streaming_neardup_pairs(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", num_perm: int = 64,
                            bands: int = 16, threshold: float = 0.5,
                            max_state_per_bucket: int = 256,
                            ttl_minutes: float | None = None) -> DataFrame:
    """Streaming MinHash near-dup: every arriving doc is compared against
    the signatures previously seen in ITS LSH band buckets, emitting
    (id_a, id_b, sig_sim) pairs as they are discovered — the streaming
    counterpart of :func:`operators.dedup.minhash_lsh_pairs` (engine
    extension beyond the reference, which has no streaming).

    Plan shape: vectorized signature UDF (the same zero-per-token kernel
    as the batch path) -> band explode -> ``applyInPandasWithState`` keyed
    by (band_id, band_hash), state = the bucket's recent (id, signature)
    list.  Same-batch pairs are found too (docs process sequentially
    within a bucket).  A pair sharing several band buckets emits once per
    bucket — run a windowed/foreachBatch distinct downstream if exact-once
    pairs matter; the duplicate rate is bounded by ``bands``.

    State is BOUNDED: ``max_state_per_bucket`` newest signatures per
    bucket (evicted partners stop pairing — the stated trade, mirroring
    the exact-dedup cap) and an optional idle-bucket TTL.  At 100 TB the
    state store shards by the band-hash key, which is uniform by
    construction — no hot-bucket skew beyond genuine near-dup clusters."""
    from geolake_spark.functions import sim as _sim
    mh = _sim.make_minhash_udf(num_perm=num_perm)
    sigs = docs.select(F.col(id_col).cast("string").alias("id"),
                       mh(F.col(text_col)).alias("minhash"))
    banded = (_sim.lsh_bands(sigs, "minhash", num_perm, bands)
              .select("id", "minhash", "band_id", "band_hash"))
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_minutes is not None else GroupStateTimeout.NoTimeout)
    ttl_ms = int(ttl_minutes * 60_000) if ttl_minutes is not None else None
    return (banded.groupBy("band_id", "band_hash")
            .applyInPandasWithState(
                _make_neardup_fn(num_perm, threshold,
                                 max_state_per_bucket, ttl_ms),
                NEARDUP_OUTPUT, NEARDUP_STATE, "append", timeout))


def exact_once_pairs(pairs: DataFrame,
                     within_watermark: tuple[str, str] | None = None
                     ) -> DataFrame:
    """Collapse :func:`streaming_neardup_pairs`' per-band duplicate
    emissions to EXACTLY-ONCE per (id_a, id_b) — a pair sharing b band
    buckets emits up to b times upstream; chained onto the stream this
    makes the streaming output equal the batch operator's pairs row-for-
    row (sig_sim is identical across emissions, so any survivor is THE
    row).

    Implementation is Spark's own stateful streaming dropDuplicates (a
    second stateful operator chained after the LSH state op — supported
    in append mode; a second applyInPandasWithState is NOT, Spark rejects
    multiple instances per query).  The dedup keys on a computed
    ``concat_ws('\\x00', id_a, id_b)`` column on purpose: keying on the
    raw id columns lets column pruning eliminate the projection between
    the Arrow-columnar stateful-op output and the dedup exchange, and the
    exchange's UnsafeRowSerializer then throws ClassCastException on
    ColumnarBatchRow (observed on Spark 4.1); a key the aggregate must
    compute keeps the row-converting projection in the plan.

    Default state holds one small key per distinct pair forever; for
    unbounded 100 TB streams pass ``within_watermark=(ts_col, delay)`` to
    use dropDuplicatesWithinWatermark, bounding state to the watermark
    horizon (dupes of one pair cluster within a crawl pass, so a horizon
    of one pass keeps exactness in practice — the stated trade)."""
    keyed = pairs.withColumn(
        "_pair", F.concat_ws("\x00", "id_a", "id_b"))
    if within_watermark is not None:
        ts_col, delay = within_watermark
        return (keyed.withWatermark(ts_col, delay)
                .dropDuplicatesWithinWatermark(["_pair"]).drop("_pair"))
    return keyed.dropDuplicates(["_pair"]).drop("_pair")


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


def curate_stream(pages: DataFrame, langs: list[str] | None = None,
                  scrub_pii: bool = False,
                  min_quality: float | None = None,
                  max_dup_trigram: float | None = None,
                  max_state: int = DEDUP_MAX_STATE,
                  ttl_minutes: float | None = None) -> DataFrame:
    """Streaming form of the curation pipeline's gate stack + exact dedup
    (the stages that make sense incrementally: global paragraph dedup and
    near-dup CC need corpus-wide state and stay batch ops — run them on
    snapshot compaction instead).  The gates are stateless plan
    expressions evaluated per micro-batch exactly as in batch
    ``curate_pages`` (same functions, same semantics); cross-batch exact
    dedup is the bounded-per-host-state operator above.  Emits the
    surviving (host, url, fp) rows."""
    from geolake_spark.functions import text as tx
    out = pages
    if langs:
        out = out.filter(F.col("lang").isin(list(langs)))
    if scrub_pii:
        out = out.withColumn("text", tx.pii_scrub_col(F.col("text")))
    if min_quality is not None:
        out = out.filter(
            tx.quality_score_col(F.col("text")) >= min_quality)
    if max_dup_trigram is not None:
        out = out.filter(
            tx.dup_ngram_frac_col(F.col("text"), 3) <= max_dup_trigram)
    return streaming_exact_dedup(out, max_state=max_state,
                                 ttl_minutes=ttl_minutes)


# ---------------------------------------------------------------------------
# Streaming geofence — the batch operators/trips.geofence_events as a
# stream: fence membership is a STREAM-STATIC broadcast join against the
# rasterized fence cells (stateless, planned per micro-batch), and the
# cross-batch "was this entity inside?" bit lives in per-entity group
# state (one int + one long — constant per entity, the smallest state in
# this module).  Within a micro-batch events sort by (ts, event_id);
# across batches the arrival order is the processing order (the standard
# stateful-streaming contract — a late event that time-travels behind an
# already-processed one is applied in arrival order, same as
# streaming_exact_dedup).  When per-entity arrival respects event time,
# output == the batch operator exactly (tested).
# ---------------------------------------------------------------------------

GEOFENCE_OUTPUT = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("fence_id", T.LongType()),
])
GEOFENCE_STATE = T.StructType([
    T.StructField("in_fence", T.IntegerType()),
    T.StructField("fence_id", T.LongType()),
])


def _geofence_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    import numpy as np
    prev_in, prev_fence = (state.get if state.exists else (None, None))
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
        fid = pdf["fence_id"].to_numpy(dtype="float64", na_value=np.nan)
        inside = ~np.isnan(fid)
        # vectorized lag chain seeded from state: prev[i] = inside[i-1]
        prev = np.empty(len(pdf), dtype="int64")
        prev[0] = -1 if prev_in is None else prev_in
        prev[1:] = inside[:-1]
        # last in-fence id strictly BEFORE each row (exit payload)
        seed = np.nan if prev_fence is None else float(prev_fence)
        before = (pd.Series(np.r_[seed, np.where(inside, fid, np.nan)[:-1]])
                  .ffill().to_numpy())
        enters = inside & (prev != 1)
        exits = ~inside & (prev == 1)
        prev_in = int(inside[-1])
        if inside.any():
            prev_fence = int(fid[inside][-1])
        hit = enters | exits
        if hit.any():
            yield pd.DataFrame({
                "entity": np.full(int(hit.sum()), key[0], dtype="int64"),
                "ts": pdf["ts"].to_numpy()[hit],
                "event_id": pdf["event_id"].to_numpy()[hit],
                "kind": np.where(enters[hit], "enter", "exit"),
                "fence_id": np.where(enters[hit], fid[hit],
                                     before[hit]).astype("int64"),
            })
    state.update((prev_in, prev_fence))


def streaming_geofence(events: DataFrame, fence_cells: DataFrame,
                       res: int, entity_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       lat_col: str = "lat",
                       lon_col: str = "lon") -> DataFrame:
    """Streaming enter/exit transitions; ``fence_cells`` is the STATIC
    rasterized ``(polygon_id, cell)`` frame (overlaps -> min id, as in
    batch).  Emits the same rows as
    :func:`geolake_spark.operators.trips.geofence_events` when events
    arrive in per-entity time order."""
    from geolake_spark.functions.geo import grid_cell_col
    fence = (fence_cells.groupBy("cell")
             .agg(F.min("polygon_id").alias("fence_id")))
    ev = events.select(
        F.col(entity_col).alias("entity"), F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        grid_cell_col(F.col(lat_col), F.col(lon_col), res).alias("cell"))
    flagged = ev.join(F.broadcast(fence), "cell", "left")
    return (flagged.groupBy("entity")
            .applyInPandasWithState(
                _geofence_fn, GEOFENCE_OUTPUT, GEOFENCE_STATE,
                "append", GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# Streaming CUSUM — the batch operators/aggregates.cusum_alarms as a
# stream: per-entity state is the two current CUSUM statistics plus the
# running summary (seven scalars — constant per entity).  Each
# micro-batch continues the recursion vectorized: with s0 the carried
# statistic and C the cumsum of the batch's drift-adjusted deltas,
# s_i = max(s0 + C_i, C_i - min_{j<=i} C_j) — the reflected-walk
# identity generalized to a nonzero start (unroll the resets: each s_i
# is the best suffix sum, seeded by s0 only when no reset intervened).
# Values are fixed-point integer cents (np.rint; exact for <=2-dp data,
# never at a .5 boundary).  Emits the running per-entity summary every
# micro-batch (update mode) — the final row equals the batch operator's
# output when per-entity arrival respects event time (tested).
# ---------------------------------------------------------------------------

CUSUM_OUTPUT = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("n_obs", T.LongType()),
    T.StructField("max_hi", T.LongType()),
    T.StructField("max_lo", T.LongType()),
    T.StructField("n_alarms", T.LongType()),
    T.StructField("first_alarm_id", T.LongType()),
])
CUSUM_STATE = T.StructType([
    T.StructField("sh", T.LongType()),
    T.StructField("sl", T.LongType()),
    T.StructField("n_obs", T.LongType()),
    T.StructField("max_hi", T.LongType()),
    T.StructField("max_lo", T.LongType()),
    T.StructField("n_alarms", T.LongType()),
    T.StructField("first_alarm_id", T.LongType()),
])


def _make_cusum_fn(target_cents: int, slack_cents: int,
                   threshold_cents: int):
    hi_ref = int(target_cents) + int(slack_cents)
    lo_ref = int(target_cents) - int(slack_cents)
    h = int(threshold_cents)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np
        if state.exists:
            sh, sl, n_obs, mh, ml, na, first = state.get
        else:
            sh = sl = n_obs = mh = ml = na = 0
            first = None
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   .sort_values(["ts", "event_id"], kind="stable"))
            cents = np.rint(pdf["value"].to_numpy(dtype="float64")
                            * 100).astype("int64")
            ids = pdf["event_id"].to_numpy(dtype="int64")
            ch = np.cumsum(cents - hi_ref)
            cl = np.cumsum(lo_ref - cents)
            s_hi = np.maximum(sh + ch, ch - np.minimum.accumulate(ch))
            s_lo = np.maximum(sl + cl, cl - np.minimum.accumulate(cl))
            alarms = (s_hi > h) | (s_lo > h)
            if first is None and alarms.any():
                first = int(ids[int(np.argmax(alarms))])
            na += int(alarms.sum())
            mh = max(mh, int(s_hi.max()))
            ml = max(ml, int(s_lo.max()))
            sh, sl = int(s_hi[-1]), int(s_lo[-1])
            n_obs += len(pdf)
        state.update((sh, sl, n_obs, mh, ml, na, first))
        yield pd.DataFrame({
            "entity": pd.array([key[0]], dtype="Int64"),
            "n_obs": pd.array([n_obs], dtype="Int64"),
            "max_hi": pd.array([mh], dtype="Int64"),
            "max_lo": pd.array([ml], dtype="Int64"),
            "n_alarms": pd.array([na], dtype="Int64"),
            "first_alarm_id": pd.array([first], dtype="Int64"),
        })
    return fn


def streaming_cusum(events: DataFrame, target_cents: int,
                    slack_cents: int, threshold_cents: int,
                    entity_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id",
                    value_col: str = "value") -> DataFrame:
    """Streaming two-sided CUSUM per entity; after the last micro-batch
    the emitted summary equals
    :func:`geolake_spark.operators.aggregates.cusum_alarms` on the same
    rows (update output mode — read the latest row per entity)."""
    ev = events.select(F.col(entity_col).alias("entity"),
                       F.col(ts_col).alias("ts"),
                       F.col(id_col).alias("event_id"),
                       F.col(value_col).alias("value"))
    return (ev.groupBy("entity")
            .applyInPandasWithState(
                _make_cusum_fn(target_cents, slack_cents, threshold_cents),
                CUSUM_OUTPUT, CUSUM_STATE,
                "update", GroupStateTimeout.NoTimeout))
