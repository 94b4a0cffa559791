"""Streaming observability — the reference's structured logging (O3,
reference app/consumer/consumer.py:10–13 `ts | level | name | message`
per applied message), upgraded to per-batch metrics via
StreamingQueryListener.

At cluster scale these records feed a metrics sink (StatsD/Prometheus);
here they accumulate in memory and are assertable in tests.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger(__name__)


@dataclass
class BatchMetric:
    query_id: str
    batch_id: int
    num_input_rows: int
    processed_rows_per_second: float


@dataclass
class MetricsCollector(StreamingQueryListener):
    """Collects one BatchMetric per completed micro-batch. Register with
    ``spark.streams.addListener(collector)``; remove with
    ``removeListener`` when done (listeners are session-global)."""

    metrics: list[BatchMetric] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:
        log.info("stream started | id=%s name=%s", event.id, event.name)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.metrics.append(
            BatchMetric(
                query_id=str(p.id),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                processed_rows_per_second=p.processedRowsPerSecond or 0.0,
            )
        )
        log.info(
            "batch done | id=%s batch=%d rows=%d", p.id, p.batchId, p.numInputRows
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass

    def onQueryTerminated(self, event) -> None:
        log.info("stream terminated | id=%s", event.id)

    def total_rows(self) -> int:
        return sum(m.num_input_rows for m in self.metrics)
