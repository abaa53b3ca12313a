"""Custom stateful operator: per-user running statistics
(SURVEY.md §2.9 stream_stateful).

The reference has no streaming at all; its closest construct is the AL loop's
running set-invariant (ner_pipeline.py:386-401). Here the operator is real
sequential state — event count, value total, and the maximum inter-event gap
per user — which needs ordered iteration within a key, not just an algebraic
aggregate (MAX of LAG-diff is a window, but carrying `last_ts` across
micro-batches is genuine state).

Two implementations over the same per-group kernel:
  - batch: ``groupBy(user_id).applyInPandas`` — whole group per Arrow batch;
  - stream: ``groupBy(user_id).applyInPandasWithState`` — state struct
    (n, total, max_gap, last_ts) persisted in the state store between
    micro-batches, update mode.

Scale notes: state is O(users) × 32 bytes — a 100M-user stream holds ~3 GB
of state sharded across executors by the groupBy hash; the state store
(RocksDB in prod) spills. The batch twin shuffles once on user_id and
streams each group through pandas — no driver collection anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, max_gap_us BIGINT"
)
STATE_SCHEMA = "n BIGINT, total DOUBLE, max_gap BIGINT, last_ts_us BIGINT"


def _fold(pdf: pd.DataFrame, n0: int, total0: float, max_gap0: float, last_us0):
    """Sequential fold over one user's events (sorted by ts, event_id)."""
    pdf = pdf.sort_values(["ts", "event_id"])
    # unit-safe: normalize whatever datetime64 unit Arrow handed us to µs
    us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    n = n0 + len(pdf)
    total = total0 + float(pdf["value"].sum())
    max_gap = max_gap0
    prev = last_us0
    for t in us:
        if prev is not None:
            gap = int(t - prev)  # exact integer microseconds — no float rounding
            if gap > max_gap:
                max_gap = gap
        prev = t
    return n, total, max_gap, prev


def user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch twin: one applyInPandas pass per user group."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        n, total, max_gap, _ = _fold(pdf, 0, 0.0, 0, None)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_gap_us": [max_gap],
            }
        )

    return events.select("user_id", "ts", "event_id", "value").groupBy("user_id").applyInPandas(stats, OUT_SCHEMA)


def user_stats_stream_tws(events: DataFrame) -> DataFrame:
    """Spark 4 arbitrary-state twin: the SAME per-user fold under
    ``transformWithStateInPandas`` (the successor API to
    applyInPandasWithState) — a StatefulProcessor with a typed ValueState
    variable instead of a positional state tuple. Feature-wise this is the
    API that adds multiple named state variables, state TTL, timers, and
    initial-state bootstrap; here it carries the identical (n, total,
    max_gap, last_ts) state so the two APIs are parity-testable against
    each other and against the batch fold.

    Runtime requirements: the RocksDB state store provider AND the
    `protobuf` Python package (the TWS state server speaks protobuf to the
    Python worker). This container ships neither protobuf nor pip access,
    so the parity test skips-with-reason here and runs green on a standard
    cluster image (tests/test_streaming.py::
    test_transform_with_state_matches_batch)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, max_gap, last_us = self._state.get()
                if last_us == -1:
                    last_us = None
            else:
                n, total, max_gap, last_us = 0, 0.0, 0, None
            for pdf in rows:
                if len(pdf):
                    n, total, max_gap, last_us = _fold(pdf, n, total, max_gap, last_us)
            self._state.update(
                (n, total, max_gap, last_us if last_us is not None else -1)
            )
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "max_gap_us": [max_gap],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserStats(),
            outputStructType=OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def user_stats_stream(events: DataFrame) -> DataFrame:
    """Streaming twin: applyInPandasWithState carries (n, total, max_gap,
    last_ts) across micro-batches; emits the updated row per user per batch."""

    def stats(key, pdfs, state: GroupState):
        if state.exists:
            n, total, max_gap, last_us = state.get
            if last_us == -1:  # map the stored sentinel back to None
                last_us = None
        else:
            n, total, max_gap, last_us = 0, 0.0, 0, None
        for pdf in pdfs:
            if len(pdf):
                n, total, max_gap, last_us = _fold(pdf, n, total, max_gap, last_us)
        state.update((n, total, max_gap, last_us if last_us is not None else -1))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_gap_us": [max_gap],
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            stats, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )
