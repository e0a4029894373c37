"""Observability surface — the reference's statsd client shape
(internal/web/web.go:24,40; middlewares/loggerfilter.go:64-74 emits
``http.count``/``http.time``/``http.size`` per request; jobs/job.go:
114-144 emits ``jobs.count``/``jobs.success``/``jobs.error`` per run)
minus the DataDog dependency: a tiny pluggable client whose sink is a
callable, so a deployment can forward to a real statsd/StatsD-line
socket, a log, or a test recorder without this engine depending on any
telemetry package.

Every emission is one event dict ``{"kind": "count"|"timing"|"gauge",
"name": ..., "value": ..., "tags": {...}}``. Timings are milliseconds
(the reference passes Go durations; ms is the statsd wire unit). Sinks
must never break the instrumented path: emission errors are swallowed
(the reference logs-and-continues on statsd errors too,
loggerfilter.go:65-75)."""

from __future__ import annotations

import logging
import threading


class Metrics:
    """statsd.ClientInterface subset: count / timing / gauge."""

    def __init__(self, sink=None):
        self._sink = sink

    def count(self, name: str, value: float = 1,
              tags: dict | None = None) -> None:
        self._emit("count", name, value, tags)

    def timing(self, name: str, ms: float,
               tags: dict | None = None) -> None:
        self._emit("timing", name, ms, tags)

    def gauge(self, name: str, value: float,
              tags: dict | None = None) -> None:
        self._emit("gauge", name, value, tags)

    def _emit(self, kind: str, name: str, value, tags) -> None:
        if self._sink is None:
            return
        try:
            self._sink({"kind": kind, "name": name, "value": value,
                        "tags": dict(tags or {})})
        except Exception:  # telemetry must never fail the hot path
            pass


class RecordingMetrics(Metrics):
    """Test/inspection sink: keeps every event (thread-safe)."""

    def __init__(self):
        super().__init__()
        self.events: list[dict] = []
        self._mu = threading.Lock()

    def _emit(self, kind, name, value, tags):
        with self._mu:
            self.events.append({"kind": kind, "name": name, "value": value,
                                "tags": dict(tags or {})})

    def named(self, name: str) -> list[dict]:
        with self._mu:
            return [e for e in self.events if e["name"] == name]


class LoggingMetrics(Metrics):
    """Structured log-line sink (one ``metric`` record per event) — the
    zero-dependency default for a deployment without a statsd relay."""

    def __init__(self, logger: logging.Logger | None = None):
        super().__init__()
        self._log = logger or logging.getLogger("datahub_spark.metrics")

    def _emit(self, kind, name, value, tags):
        try:
            self._log.info("metric %s %s=%s %s", kind, name, value,
                           dict(tags or {}))
        except Exception:
            pass


def statsd_line(event: dict) -> str:
    """One DogStatsD wire line for an event — the exact format the
    reference's statsd client ships (web.go:24 constructs a DataDog
    statsd client; conf/metrics.go wires its namespace/tags):
    ``name:value|TYPE[|#tag:val,...]`` with c/ms/g for
    count/timing/gauge."""
    t = {"count": "c", "timing": "ms", "gauge": "g"}[event["kind"]]
    v = event["value"]
    line = f"{event['name']}:{v:g}|{t}" if isinstance(v, float) \
        else f"{event['name']}:{v}|{t}"
    tags = event.get("tags") or {}
    if tags:
        line += "|#" + ",".join(f"{k}:{tags[k]}" for k in sorted(tags))
    return line


class StatsdMetrics(Metrics):
    """UDP statsd sink: fire-and-forget datagrams, one event per
    packet, never blocking or failing the instrumented path (datagram
    sends don't wait for a receiver — statsd's design and the reason
    the reference logs-and-continues on telemetry errors)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 8125,
                 prefix: str = ""):
        super().__init__()
        import socket

        self._addr = (host, port)
        self._prefix = prefix
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def _emit(self, kind, name, value, tags):
        try:
            line = statsd_line({"kind": kind,
                                "name": self._prefix + name,
                                "value": value, "tags": tags})
            self._sock.sendto(line.encode(), self._addr)
        except Exception:
            pass

    def close(self) -> None:
        try:
            self._sock.close()
        except Exception:
            pass
