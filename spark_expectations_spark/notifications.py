"""Notification protocol + built-in implementations.

The reference ships email/Slack/Teams/Zoom/PagerDuty plugins behind pluggy
(notifications/plugins/*, ~50-200 LoC each of vendor HTTP). Here the seam
is a plain protocol: anything callable with (event, payload). Built-ins are
console/collecting/webhook (webhook gated on urllib availability — no
external deps). Vendor channels are deployment concerns, not engine code.

Trigger semantics re-expressed from
notifications/push/spark_expectations_notify.py:42-388: on_start,
on_completion, on_failure, on_error_threshold (error_percentage crosses
config), per-rule error-drop threshold breaches.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from typing import Any, Callable, Protocol

from .core.state import DQResult

log = logging.getLogger("spark_expectations_spark.notifications")

Event = str  # 'start' | 'completion' | 'failure' | 'error_threshold' | 'rule_threshold'


class Notifier(Protocol):
    def __call__(self, event: Event, payload: dict[str, Any]) -> None: ...


def console_notifier(event: Event, payload: dict[str, Any]) -> None:
    log.warning("[dq:%s] %s", event, json.dumps(payload, default=str, sort_keys=True))


@dataclass
class CollectingNotifier:
    """Test/audit notifier: records every (event, payload)."""
    events: list[tuple[Event, dict[str, Any]]] = field(default_factory=list)

    def __call__(self, event: Event, payload: dict[str, Any]) -> None:
        self.events.append((event, payload))


def webhook_notifier(url: str, *, timeout: float = 10.0) -> Notifier:
    """POST JSON to a webhook (Slack/Teams-style). Uses stdlib urllib."""

    def notify(event: Event, payload: dict[str, Any]) -> None:
        import urllib.request

        body = json.dumps({"event": event, **payload}, default=str).encode()
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=timeout)
        except Exception as e:  # notification failure must not fail the run
            log.error("webhook notification failed: %s", e)

    return notify


@dataclass
class NotificationRules:
    notify_on_start: bool = False
    notify_on_completion: bool = False
    notify_on_failure: bool = True
    error_threshold_pct: float | None = None    # error_percentage above → alert
    #: digest of failed rules whose action is 'ignore' (silently passing
    #: violations; reference user_config
    #: se_notifications_on_rules_action_if_failed_set_ignore)
    notify_on_ignored_rules: bool = False


class NotificationHub:
    def __init__(self, rules: NotificationRules | None = None):
        self.rules = rules or NotificationRules()
        self._notifiers: list[Notifier] = []

    def register(self, notifier: Notifier) -> "NotificationHub":
        self._notifiers.append(notifier)
        return self

    def _emit(self, event: Event, payload: dict[str, Any]) -> None:
        for n in self._notifiers:
            try:
                n(event, payload)
            except Exception as e:
                log.error("notifier %r failed: %s", n, e)

    # -- lifecycle hooks -----------------------------------------------------
    def on_start(self, product_id: str, table_name: str) -> None:
        if self.rules.notify_on_start:
            self._emit("start", {"product_id": product_id, "table_name": table_name})

    def on_completion(self, result: DQResult, rules=None) -> None:
        if self.rules.notify_on_completion:
            self._emit("completion", _result_payload(result))
        self._check_thresholds(result, rules)

    def on_failure(self, product_id: str, table_name: str, error: Exception) -> None:
        if self.rules.notify_on_failure:
            self._emit("failure", {
                "product_id": product_id, "table_name": table_name,
                "error": f"{type(error).__name__}: {error}",
            })

    def _check_thresholds(self, result: DQResult, rules=None) -> None:
        thr = self.rules.error_threshold_pct
        if thr is not None and result.error_percentage > thr:
            self._emit("error_threshold", {
                **_result_payload(result), "threshold_pct": thr,
            })
        if result.row_summary is None or not result.input_count or rules is None:
            return
        if self.rules.notify_on_ignored_rules:
            by_name = {r.rule: r for r in rules}
            ignored = [
                {"rule": rule, "failed_count": cnt}
                for rule, cnt in result.row_summary.rule_failed_counts.items()
                if cnt and by_name.get(rule) is not None
                and by_name[rule].action_if_failed == "ignore"
            ]
            if ignored:
                self._emit("ignored_rules", {
                    **_result_payload(result), "ignored": ignored,
                })
        # per-rule error-drop alerts (reference notify:253-343): alert when
        # a rule's failed-row percentage crosses its own threshold
        by_name = {r.rule: r for r in rules}
        breaches = []
        for rule, cnt in result.row_summary.rule_failed_counts.items():
            r = by_name.get(rule)
            if r is None or not r.enable_error_drop_alert or not cnt:
                continue
            pct = cnt / result.input_count * 100
            if pct >= r.error_drop_threshold:
                breaches.append({
                    "rule": rule, "failed_count": cnt,
                    "failed_pct": round(pct, 2),
                    "threshold_pct": r.error_drop_threshold,
                })
        if breaches:
            self._emit("rule_threshold", {
                **_result_payload(result), "breaches": breaches,
            })


def _result_payload(result: DQResult) -> dict[str, Any]:
    return {
        "run_id": result.run_id,
        "product_id": result.product_id,
        "table_name": result.table_name,
        "input_count": result.input_count,
        "error_count": result.error_count,
        "output_count": result.output_count,
        "error_percentage": result.error_percentage,
        "status": dict(result.status),
    }
