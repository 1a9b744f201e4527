"""Driver-side ingestion poller (entry point B, raw_all.py:55-179).

Spark has no HTTP source, so (as SURVEY §3.2 maps it) ingestion is a
small driver loop that lands snapshot files for the streaming file
source to pick up. Reproduced semantics:

- fetch text snapshot from a callable (HTTP in prod; injected in tests)
- mojibake repair hook (raw_all.py:80 used ftfy; gated import here —
  not installed in this container, falls back to encoding.fix_mojibake,
  a minimal reimplementation of ftfy's latin-1/cp1252 round-trip repair)
- SHA-256 duplicate gate vs the most recent landed file
  (raw_all.py:83-136): identical payload → skip landing
- dt=YYYY-MM-DD partition dirs, wrm_stations_{ts}.txt filenames
  (processed_all.py:18-20 key pattern)
- thin retry with exponential backoff (retry/decorators.py API preset:
  3 attempts, 0.5 s base, 10 s cap — the one piece of the reference's
  retry stack not subsumed by Spark task retries)
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable
from datetime import datetime, timedelta, timezone
from pathlib import Path

try:  # optional, mirrors raw_all.py:80; prefer the real library if present
    from ftfy import fix_text  # type: ignore
except ImportError:  # pragma: no cover
    # Public-knowledge fallback implementing ftfy's documented fixers
    # (HTML-entity unescape → undo UTF-8-decoded-as-latin-1/cp1252 →
    # quote normalization) instead of passing mojibake through.
    from ..encoding import fix_text

FILENAME_FMT = "wrm_stations_{ts}.txt"
TS_FMT = "%Y-%m-%d_%H-%M-%S"

# API_CALL preset (reference retry/decorators.py:601-608)
RETRY_ATTEMPTS = 3
RETRY_BASE_S = 0.5
RETRY_CAP_S = 10.0


def sha256_text(payload: str) -> str:
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


def fetch_with_retry(fetch: Callable[[], str], sleep=time.sleep) -> str:
    last_exc: Exception | None = None
    for attempt in range(RETRY_ATTEMPTS):
        try:
            return fetch()
        except Exception as exc:  # noqa: BLE001 — retry-all like the API preset
            last_exc = exc
            if attempt < RETRY_ATTEMPTS - 1:
                sleep(min(RETRY_BASE_S * (2**attempt), RETRY_CAP_S))
    raise last_exc  # type: ignore[misc]


class LandingZone:
    """dt=-partitioned text landing directory with a duplicate gate."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._last_hash: str | None = None

    def _latest_file(self) -> Path | None:
        files = sorted(
            self.root.glob("dt=*/wrm_stations_*.txt"), key=lambda p: p.stat().st_mtime
        )
        return files[-1] if files else None

    def last_hash(self) -> str | None:
        """Hash of the most recent landed payload (lazily recovered from
        disk after restart — the reference re-hashes the latest S3
        object, raw_all.py:96-118)."""
        if self._last_hash is None:
            latest = self._latest_file()
            if latest is not None:
                self._last_hash = sha256_text(latest.read_text(encoding="utf-8"))
        return self._last_hash

    def land(self, payload: str, now: datetime | None = None) -> Path | None:
        """Write one snapshot; returns the path, or None when the payload
        is byte-identical to the previous one (dup gate, P12/ST5)."""
        payload = fix_text(payload)
        digest = sha256_text(payload)
        if digest == self.last_hash():
            return None
        now = now or datetime.now(timezone.utc)
        dt_dir = self.root / f"dt={now:%Y-%m-%d}"
        dt_dir.mkdir(parents=True, exist_ok=True)
        path = dt_dir / FILENAME_FMT.format(ts=now.strftime(TS_FMT))
        while path.exists():
            # filename granularity is 1 s; two polls in the same second
            # must not overwrite — bump until unique (keeps the
            # wrm_stations_<ts>.txt pattern and chronological order)
            now = now + timedelta(seconds=1)
            path = dt_dir / FILENAME_FMT.format(ts=now.strftime(TS_FMT))
        tmp = path.with_suffix(".tmp")
        tmp.write_text(payload, encoding="utf-8")
        tmp.rename(path)  # atomic publish: the stream never sees partials
        self._last_hash = digest
        return path


def poll_forever(
    fetch: Callable[[], str],
    landing: LandingZone,
    interval_s: float = 30.0,
    max_polls: int | None = None,
    sleep=time.sleep,
    breaker=None,
) -> int:
    """Sensor cadence (sensors/stations.py:10): fetch → gate → land every
    30 s. Failures are logged-and-skipped (SkipReason semantics). An
    optional CircuitBreaker (streaming/breaker.py) short-circuits polls
    while the upstream API is down."""
    landed = 0
    polls = 0
    while max_polls is None or polls < max_polls:
        polls += 1
        try:
            if breaker is not None:
                payload = breaker.call(fetch_with_retry, fetch, sleep=sleep)
            else:
                payload = fetch_with_retry(fetch, sleep=sleep)
            if landing.land(payload) is not None:
                landed += 1
        except Exception:  # noqa: BLE001 — sensor keeps polling
            pass
        if max_polls is None or polls < max_polls:
            sleep(interval_s)
    return landed
