"""Delivery side-channels: webhook retries, LLM local fallback — all
through fake transports; no test ever opens a socket."""

from __future__ import annotations

from ecommerce_event_pipeline_spark.delivery import (
    LLMReporter,
    WebhookClient,
    fallback_report,
)


def _no_sleep(_):  # backoff is policy, not wall-clock, in tests
    pass


def test_webhook_unconfigured_logs_and_returns_false(caplog):
    client = WebhookClient(url=None)
    assert client.post({"text": "hi"}) is False


def test_webhook_success_first_attempt():
    calls = []

    def transport(url, body, headers):
        calls.append((url, body, headers))
        return 200, "ok"

    client = WebhookClient(url="https://example.invalid/hook",
                           transport=transport, sleep=_no_sleep)
    assert client.post({"text": "hi"}) is True
    assert client.attempts_made == 1
    assert calls[0][2]["Content-Type"] == "application/json"


def test_webhook_retries_with_exponential_backoff_then_succeeds():
    attempts, delays = [], []

    def flaky(url, body, headers):
        attempts.append(1)
        if len(attempts) < 3:
            raise OSError("connection reset")
        return 200, "ok"

    client = WebhookClient(
        url="https://example.invalid/hook",
        max_attempts=3,
        base_delay=1.0,
        transport=flaky,
        sleep=delays.append,
    )
    assert client.post({"x": 1}) is True
    assert client.attempts_made == 3
    assert delays == [1.0, 2.0]  # doubling backoff


def test_webhook_exhausts_retries_on_persistent_failure():
    def always_500(url, body, headers):
        return 500, "boom"

    client = WebhookClient(url="https://example.invalid/hook",
                           max_attempts=3, transport=always_500,
                           sleep=_no_sleep)
    assert client.post({"x": 1}) is False
    assert client.attempts_made == 3


def test_llm_reporter_returns_model_text_on_success():
    rep = LLMReporter(url="https://example.invalid/llm",
                      transport=lambda u, b, h: (200, "model words"),
                      sleep=_no_sleep)
    assert rep.generate("2026-03-01", "prompt", {}) == "model words"


def test_llm_reporter_falls_back_locally_on_failure():
    def down(url, body, headers):
        raise OSError("unreachable")

    kpis = {"total_events": 5, "unique_users": 3, "buyers": 1, "revenue": 9.5}
    rep = LLMReporter(url="https://example.invalid/llm", transport=down,
                      sleep=_no_sleep)
    out = rep.generate("2026-03-01", "prompt", kpis)
    assert out == fallback_report("2026-03-01", kpis)
    assert "fallback" in out and "5 events" in out


def test_llm_reporter_unconfigured_is_pure_local():
    out = LLMReporter().generate("2026-03-01", "prompt", {"total_events": 2})
    assert "fallback" in out
