"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only cross-batch state is an in-memory Python dict in
its alert manager (reference: monitoring/alert_manager.py:83-94
last-alert cache, :398-461 hourly counters) — state that dies with the
process and never scales past one consumer. These operators rebuild
that semantics on Spark's managed state store: partitioned by key,
checkpointed, recoverable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _running_schema(keyed: "DataFrame", key_col: str) -> StructType:
    """Output schema carrying the CALLER's key column — name and type
    — instead of a hardcoded string 'key' (a long key would fail the
    Arrow conversion; a renamed key broke downstream joins)."""
    return StructType(
        [
            StructField(key_col, keyed.schema[key_col].dataType),
            StructField("events_total", LongType()),
            StructField("value_total", DoubleType()),
            StructField("batches_seen", LongType()),
        ]
    )

_STATE_SCHEMA = StructType(
    [
        StructField("events_total", LongType()),
        StructField("value_total", DoubleType()),
        StructField("batches_seen", LongType()),
    ]
)


def running_totals(
    keyed: DataFrame, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """Cross-batch running totals per key — the managed-state
    replacement for the reference's process-local counters. Emits the
    updated running row for every key seen in the micro-batch."""

    def update(key, pdfs, state: GroupState):
        events, total, batches = (
            state.get if state.exists else (0, 0.0, 0)
        )
        for pdf in pdfs:
            # count and sum the SAME row population: rows with a null
            # value are excluded from both totals (counting them only
            # in events_total silently deflated downstream averages)
            vals = pdf[value_col].dropna()
            events += len(vals)
            total += float(vals.sum())
        batches += 1
        state.update((events, total, batches))
        import pandas as pd

        yield pd.DataFrame(
            [
                {
                    key_col: key[0],
                    "events_total": events,
                    "value_total": total,
                    "batches_seen": batches,
                }
            ]
        )

    return keyed.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_running_schema(keyed, key_col),
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_tws(
    keyed: DataFrame, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """running_totals on the transformWithStateInPandas API (Spark 4's
    successor to applyInPandasWithState): state lives in named, typed
    handles (ValueState) managed per key by the state store, rather
    than one opaque tuple — the forward-looking form of the same
    cross-batch counter semantics.

    Runtime requirement: Spark's transformWithState Python worker
    imports protobuf; environments without ``google.protobuf`` (like
    this build container) must use running_totals instead — the test
    suite skips accordingly."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            events, total, batches = (
                self._totals.get() if self._totals.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                vals = pdf[value_col].dropna()
                events += len(vals)
                total += float(vals.sum())
            batches += 1
            self._totals.update((events, total, batches))
            yield pd.DataFrame(
                [
                    {
                        key_col: key[0],
                        "events_total": events,
                        "value_total": total,
                        "batches_seen": batches,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return keyed.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=_running_schema(keyed, key_col),
        outputMode="update",
        timeMode="none",
    )


_SUPPRESS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("emitted_ms", LongType()),
        StructField("suppressed_since_last", LongType()),
    ]
)

_SUPPRESS_STATE = StructType(
    [StructField("last_emit_ms", LongType()), StructField("suppressed", LongType())]
)


def temporal_suppression(
    keyed: DataFrame,
    key_col: str = "key",
    ts_ms_col: str = "ts_ms",
    threshold_ms: int = 15 * 60 * 1000,
) -> DataFrame:
    """True cross-batch alert suppression: emit the first alert per
    key, swallow repeats until ``threshold_ms`` has elapsed since the
    last emission, counting what was suppressed.

    This is the exact semantics of the reference's alert-dedup cache
    (reference: monitoring/alert_manager.py:83-94, 15-min threshold at
    :484) — stateful across micro-batches, unlike the bucket-windowed
    batch approximation in plans/windowed_queries.py."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        last_emit, suppressed = state.get if state.exists else (None, 0)
        out = []
        rows = pd.concat(list(pdfs)).sort_values(ts_ms_col)
        for ts in rows[ts_ms_col]:
            ts = int(ts)
            if last_emit is None or ts - last_emit >= threshold_ms:
                out.append(
                    {
                        "key": key[0],
                        "emitted_ms": ts,
                        "suppressed_since_last": suppressed,
                    }
                )
                last_emit, suppressed = ts, 0
            else:
                suppressed += 1
        state.update((last_emit, suppressed))
        if out:
            yield pd.DataFrame(out)

    return keyed.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_SUPPRESS_SCHEMA,
        stateStructType=_SUPPRESS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
