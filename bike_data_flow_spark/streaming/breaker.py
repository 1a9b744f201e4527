"""Circuit breaker for the driver-side ingestion fetch (ST8).

Reference: retry/circuit_breaker.py — thread-safe CLOSED/OPEN/HALF_OPEN
state machine, open after 5 consecutive failures, 60 s recovery
timeout, close after 3 successes in HALF_OPEN (defaults at :41-44).
Spark task retries + S3A retries cover executor-side I/O; this exists
only for the driver HTTP fetch loop, per SURVEY §2.9 ST8.
"""

from __future__ import annotations

import threading
import time
from enum import Enum


class State(Enum):
    CLOSED = "closed"
    OPEN = "open"
    HALF_OPEN = "half_open"


class CircuitOpenError(RuntimeError):
    pass


class CircuitBreaker:
    def __init__(
        self,
        failure_threshold: int = 5,
        recovery_timeout_s: float = 60.0,
        success_threshold: int = 3,
        clock=time.monotonic,
    ):
        self.failure_threshold = failure_threshold
        self.recovery_timeout_s = recovery_timeout_s
        self.success_threshold = success_threshold
        self._clock = clock
        self._lock = threading.Lock()
        self._state = State.CLOSED
        self._failures = 0
        self._successes = 0
        self._opened_at: float | None = None

    @property
    def state(self) -> State:
        with self._lock:
            self._maybe_half_open()
            return self._state

    def _maybe_half_open(self) -> None:
        if (
            self._state is State.OPEN
            and self._opened_at is not None
            and self._clock() - self._opened_at >= self.recovery_timeout_s
        ):
            self._state = State.HALF_OPEN
            self._successes = 0

    def call(self, fn, *args, **kwargs):
        with self._lock:
            self._maybe_half_open()
            if self._state is State.OPEN:
                raise CircuitOpenError(
                    f"circuit open; retry after {self.recovery_timeout_s}s"
                )
        try:
            result = fn(*args, **kwargs)
        except Exception:
            self._on_failure()
            raise
        self._on_success()
        return result

    def _on_success(self) -> None:
        with self._lock:
            if self._state is State.HALF_OPEN:
                self._successes += 1
                if self._successes >= self.success_threshold:
                    self._state = State.CLOSED
                    self._failures = 0
            else:
                self._failures = 0

    def _on_failure(self) -> None:
        with self._lock:
            if self._state is State.HALF_OPEN:
                self._state = State.OPEN
                self._opened_at = self._clock()
                return
            self._failures += 1
            if self._failures >= self.failure_threshold:
                self._state = State.OPEN
                self._opened_at = self._clock()
