"""Query-progress metrics via StreamingQueryListener (SURVEY.md §2.10
X2-X3).

The reference measures processing latency with wall-clock deltas in a
Python collector (reference: monitoring/metrics_collector.py:146-148)
and Kafka consumer lag by diffing end_offsets against committed
offsets (monitoring/performance_monitor.py:72-124). Structured
Streaming already exposes both through query progress events — this
listener captures them as rows an ordinary DataFrame/metrics sink can
consume, no side channel needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_name: str
    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    process_rows_per_second: float
    batch_duration_ms: int
    sources: list[dict] = field(default_factory=list)


class ProgressMetricsListener(StreamingQueryListener):
    """Collects per-micro-batch metrics.

    ``sources`` carries each source's startOffset/endOffset/latestOffset
    — the engine-side equivalent of the reference's consumer-lag
    monitor (lag = latestOffset - endOffset for Kafka sources).
    """

    def __init__(self) -> None:
        self.metrics: list[BatchMetric] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.metrics.append(
            BatchMetric(
                query_name=p.name or p.id,
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                input_rows_per_second=p.inputRowsPerSecond or 0.0,
                process_rows_per_second=p.processedRowsPerSecond or 0.0,
                # triggerExecution already spans addBatch/getBatch/
                # queryPlanning/walCommit — summing the map double-counts.
                batch_duration_ms=(p.durationMs or {}).get("triggerExecution", 0),
                sources=[
                    {
                        "description": s.description,
                        "start_offset": s.startOffset,
                        "end_offset": s.endOffset,
                        "latest_offset": s.latestOffset,
                        "num_input_rows": s.numInputRows,
                    }
                    for s in (p.sources or [])
                ],
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
