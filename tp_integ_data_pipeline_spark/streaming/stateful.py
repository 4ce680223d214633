"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.7 T5 extension; north-star "custom stateful operators").

The reference's only state is "last stored row" (main.py:101-103);
this generalizes to arbitrary per-key state with explicit timeout
semantics — the Structured Streaming shape for sessionization,
running counters, and dedup-with-TTL at scale (state lives in the
state store, partitioned by key, checkpointed per batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTER_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
COUNTER_STATE_SCHEMA = "n bigint, total double"


def _count_events(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum) carried in the state store."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def stateful_user_counter(events_stream: DataFrame) -> DataFrame:
    """Streaming plan: per-user running event counter with explicit
    state (update mode; no timeout — counters are eternal)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _count_events,
            outputStructType=COUNTER_OUTPUT_SCHEMA,
            stateStructType=COUNTER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 arbitrary-state API.
# ENVIRONMENT-GATED: executing this operator requires `google.protobuf`
# in the Python env (Spark's TWS driver worker speaks protobuf to the
# JVM; verified failure mode: STREAMING_PYTHON_RUNNER_INITIALIZATION_
# FAILURE / ImportError google.protobuf.descriptor). This container has
# no protobuf and installs are off-limits, so the operator ships
# implemented + import-gated with a skip-gated test; q64's
# applyInPandasWithState covers the exercised custom-stateful path.
# --------------------------------------------------------------------------
try:  # pragma: no cover - import-gated for older runtimes
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserCounterProcessor(StatefulProcessor):
        """Per-user running (count, sum) on the new transformWithState
        API: typed ValueState in the state store (RocksDB-backed on a
        real cluster), explicit init/close lifecycle — the successor to
        applyInPandasWithState with first-class state types, timers and
        TTL support."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "counter", "n bigint, total double"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    def transform_with_state_counter(events_stream: DataFrame) -> DataFrame:
        return (
            events_stream.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                UserCounterProcessor(),
                outputStructType=COUNTER_OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover
    UserCounterProcessor = None

    def transform_with_state_counter(events_stream: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0"
        )
