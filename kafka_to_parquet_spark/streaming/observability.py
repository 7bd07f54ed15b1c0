"""T2: pipeline observability — the Spark-idiomatic form of the
reference's consumer lifecycle hooks (reference src/main.rs:42-54:
``pre_rebalance`` / ``post_rebalance`` log partition assignment
changes, ``commit_callback`` logs every offset commit result).

Spark owns partition assignment and offset tracking inside Structured
Streaming, so the equivalent surface is a ``StreamingQueryListener``:

- ``onQueryStarted``   ≈ post_rebalance — the query (and its source
  partitions) has been assigned and is consuming.
- ``onQueryProgress``  ≈ commit_callback — fires once per micro-batch
  after the offsets for that batch are committed to the checkpoint;
  carries the committed end offsets per source, input row counts, and
  batch duration (strictly more than the reference logs).
- ``onQueryTerminated``≈ pre_rebalance revocation / shutdown — the
  query released its assignment (cleanly or with an exception).

The listener is process-local observability: events are appended to
bounded in-memory lists (for tests/ops introspection) and mirrored to
the ``kafka_to_parquet_spark.streaming`` logger, exactly the
"log what the consumer is doing" behavior of the reference hooks. At
scale this is driver-side only and O(1) per micro-batch — no executor
or data-path cost.
"""

from __future__ import annotations

import logging
import threading
import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("kafka_to_parquet_spark.streaming")

# Keep at most this many progress records per listener so an unbounded
# (24/7) streaming job can't grow driver memory without bound.
MAX_EVENTS = 1000


class PipelineListener(StreamingQueryListener):
    """Collects started/progress/terminated events and logs them.

    Listener callbacks arrive on a dedicated delivery thread (PySpark
    forwards JVM bus events asynchronously), so state is lock-guarded
    and tests must poll (``wait_for``) rather than assert immediately
    after ``awaitTermination`` returns.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.started: list[dict] = []
        self.progress: list[dict] = []
        self.terminated: list[dict] = []

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event) -> None:
        rec = {"id": str(event.id), "run_id": str(event.runId), "name": event.name}
        with self._lock:
            self.started.append(rec)
            del self.started[:-MAX_EVENTS]
        log.info("stream started: id=%s run=%s name=%s", event.id, event.runId, event.name)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "duration_ms": dict(p.durationMs or {}),
            "sources": [
                {"description": s.description, "end_offset": s.endOffset}
                for s in (p.sources or [])
            ],
        }
        with self._lock:
            self.progress.append(rec)
            del self.progress[:-MAX_EVENTS]
        log.info(
            "batch committed: id=%s batch=%d rows=%d offsets=%s",
            p.id,
            p.batchId,
            p.numInputRows,
            [s["end_offset"] for s in rec["sources"]],
        )

    def onQueryIdle(self, event) -> None:  # Spark 3.5+; nothing to record
        log.debug("stream idle: id=%s", event.id)

    def onQueryTerminated(self, event) -> None:
        rec = {"id": str(event.id), "exception": event.exception}
        with self._lock:
            self.terminated.append(rec)
            del self.terminated[:-MAX_EVENTS]
        if event.exception:
            log.error("stream terminated with error: id=%s err=%s", event.id, event.exception)
        else:
            log.info("stream terminated cleanly: id=%s", event.id)

    # -- test / ops helpers ----------------------------------------------
    def snapshot(self) -> dict[str, list[dict]]:
        with self._lock:
            return {
                "started": list(self.started),
                "progress": list(self.progress),
                "terminated": list(self.terminated),
            }

    def wait_for(self, kind: str, query_id: str, timeout: float = 30.0) -> dict | None:
        """Poll until an event of ``kind`` for ``query_id`` arrives
        (delivery is async relative to awaitTermination)."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._lock:
                for rec in getattr(self, kind):
                    if rec["id"] == query_id:
                        return rec
            time.sleep(0.1)
        return None


# One listener per Spark application: repeated streaming_sink calls in
# one session must not stack duplicate listeners (each would receive —
# and log — every event again). Keyed by applicationId, not id(spark),
# so a re-created session object over the same app reuses the
# registration. Lock-guarded: two threads starting sinks concurrently
# on a fresh app must not both pass the missing-key check and register
# twice (the loser would double-log every event forever).
_ATTACHED: dict[str, PipelineListener] = {}
_ATTACH_LOCK = threading.Lock()


def attach_listener(spark: SparkSession) -> PipelineListener:
    """Register (once per app) and return the pipeline listener."""
    key = spark.sparkContext.applicationId
    with _ATTACH_LOCK:
        if key not in _ATTACHED:
            # A long-lived process cycling through many SparkSessions
            # would otherwise accumulate one orphaned listener per
            # stopped application; drop entries for dead apps first.
            for old in [k for k in _ATTACHED if k != key]:
                del _ATTACHED[old]
            listener = PipelineListener()
            spark.streams.addListener(listener)
            _ATTACHED[key] = listener
        return _ATTACHED[key]
