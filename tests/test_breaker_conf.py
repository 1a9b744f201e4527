"""Circuit-breaker state machine (reference defaults: open@5 failures,
60 s recovery, close@3 successes) + config resolution chain."""

from __future__ import annotations

import pytest

from bike_data_flow_spark.conf import resolve
from bike_data_flow_spark.streaming.breaker import (
    CircuitBreaker,
    CircuitOpenError,
    State,
)


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _failing():
    raise ConnectionError("down")


def test_opens_after_threshold_failures():
    cb = CircuitBreaker(clock=Clock())
    for _ in range(4):
        with pytest.raises(ConnectionError):
            cb.call(_failing)
        assert cb.state is State.CLOSED
    with pytest.raises(ConnectionError):
        cb.call(_failing)
    assert cb.state is State.OPEN
    with pytest.raises(CircuitOpenError):
        cb.call(lambda: "never runs")


def test_success_resets_failure_count():
    cb = CircuitBreaker(clock=Clock())
    for _ in range(4):
        with pytest.raises(ConnectionError):
            cb.call(_failing)
    assert cb.call(lambda: "ok") == "ok"
    for _ in range(4):
        with pytest.raises(ConnectionError):
            cb.call(_failing)
    assert cb.state is State.CLOSED  # counter was reset by the success


def test_half_open_recovery_and_close():
    clock = Clock()
    cb = CircuitBreaker(clock=clock)
    for _ in range(5):
        with pytest.raises(ConnectionError):
            cb.call(_failing)
    assert cb.state is State.OPEN
    clock.t += 61
    assert cb.state is State.HALF_OPEN
    for i in range(3):
        cb.call(lambda: "ok")
    assert cb.state is State.CLOSED


def test_half_open_failure_reopens():
    clock = Clock()
    cb = CircuitBreaker(clock=clock)
    for _ in range(5):
        with pytest.raises(ConnectionError):
            cb.call(_failing)
    clock.t += 61
    assert cb.state is State.HALF_OPEN
    with pytest.raises(ConnectionError):
        cb.call(_failing)
    assert cb.state is State.OPEN
    with pytest.raises(CircuitOpenError):
        cb.call(lambda: "no")


def test_conf_resolution_chain():
    # override wins over env wins over default
    env = {"WRM_API_URL": "http://env", "AWS_ACCESS_KEY_ID": "env-key"}
    out = resolve({"api_url": "http://explicit"}, env=env)
    assert out["api_url"] == "http://explicit"
    assert out["s3_access_key"] == "env-key"
    assert out["s3_endpoint"] is None  # default

    out = resolve(env={})
    assert out["api_url"].startswith("https://")  # default stand-in
