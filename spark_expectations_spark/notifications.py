"""Notification protocol + built-in implementations.

The reference ships email/Slack/Teams/Zoom/PagerDuty plugins behind pluggy
(notifications/plugins/*, ~50-200 LoC each of vendor HTTP). Here the seam
is a plain protocol: anything callable with (event, payload). Built-ins are
console/collecting/webhook (webhook gated on urllib availability — no
external deps), plus channel-NATIVE payload formatters with reference
parity (slack_payload/teams_payload/zoom_payload/pagerduty_payload and
their notifier constructors) so a migrating user's Teams webhook gets a
card, not generic JSON; transport stays the one stdlib webhook POST.

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


def webhook_notifier(url: str, *, timeout: float = 10.0,
                     headers: dict[str, str] | None = None,
                     secret_resolver: Any = None,
                     formatter: Callable[[Event, dict[str, Any]],
                                         dict[str, Any] | None] | None = None,
                     ) -> Notifier:
    """POST JSON to a webhook (Slack/Teams-style). Uses stdlib urllib.
    ``headers`` carries channel auth (e.g. Zoom's Authorization token —
    reference notifications/plugins/zoom.py). ``url`` and header values
    may be ``secret://`` refs resolved through ``secret_resolver``
    (secrets.py seam) at send time, so plaintext tokens never sit in
    config. ``formatter`` maps (event, payload) to the channel-native
    body — :func:`slack_payload`, :func:`teams_payload`,
    :func:`pagerduty_payload` below — defaulting to the generic
    ``{"event": ..., **payload}`` JSON; a formatter returning ``None``
    suppresses the send (PagerDuty's failure-only gate)."""

    def notify(event: Event, payload: dict[str, Any]) -> None:
        import urllib.request

        from .secrets import resolve_options, resolve_value

        doc = (formatter(event, payload) if formatter is not None
               else {"event": event, **payload})
        if doc is None:
            return
        body = json.dumps(doc, default=str).encode()
        req = urllib.request.Request(
            resolve_value(url, secret_resolver), data=body,
            headers={"Content-Type": "application/json",
                     **resolve_options(headers or {}, secret_resolver)})
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
    #: minimum rule priority for per-rule alert content ('low' admits all;
    #: reference notify.py:253-343 gates channel payloads the same way)
    min_priority: str = "low"


_PRIORITY_RANK = {"low": 0, "medium": 1, "high": 2}


def _meets_priority(rule_priority: str, floor: str) -> bool:
    return (_PRIORITY_RANK.get((rule_priority or "medium").lower(), 1)
            >= _PRIORITY_RANK.get((floor or "low").lower(), 0))


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
                {"rule": rule, "failed_count": cnt,
                 "priority": by_name[rule].priority}
                for rule, cnt in result.row_summary.rule_failed_counts.items()
                if cnt and by_name.get(rule) is not None
                and by_name[rule].action_if_failed == "ignore"
                and _meets_priority(by_name[rule].priority,
                                    self.rules.min_priority)
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
            if not _meets_priority(r.priority, self.rules.min_priority):
                continue
            pct = cnt / result.input_count * 100
            if pct >= r.error_drop_threshold:
                breaches.append({
                    "rule": rule, "failed_count": cnt,
                    "failed_pct": round(pct, 2),
                    "threshold_pct": r.error_drop_threshold,
                    "priority": r.priority,
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


# ---------------------------------------------------------------------------
# Message formatting (reference notifications/push/spark_expectations_notify
# .py builds one multi-line text block per trigger; push/alert.py renders an
# HTML per-rule report table for mail bodies)
# ---------------------------------------------------------------------------

def format_notification_text(event: Event, payload: dict[str, Any]) -> str:
    """The human-readable block channels post — stable field order so
    alert routing/regexes can rely on it."""
    head = {
        "start": "Spark expectations run started",
        "completion": "Spark expectations run completed",
        "failure": "Spark expectations run FAILED",
        "error_threshold": "Error threshold breached",
        "rule_threshold": "Rule error-drop threshold breached",
        "ignored_rules": "Ignore-action rules failed silently",
    }.get(event, event)
    lines = [head]
    for k in ("product_id", "table_name", "run_id", "input_count",
              "error_count", "output_count", "error_percentage"):
        if k in payload:
            lines.append(f"{k}: {payload[k]}")
    if "status" in payload:
        lines.append("status: " + ", ".join(
            f"{s}={v}" for s, v in payload["status"].items()))
    if "breaches" in payload:
        for b in payload["breaches"]:
            lines.append(
                f"breach: rule={b['rule']} failed={b['failed_count']} "
                f"threshold={b['threshold_pct']}%")
    if "ignored" in payload:
        for g in payload["ignored"]:
            lines.append(
                f"ignored: rule={g['rule']} failed={g['failed_count']} "
                f"priority={g['priority']}")
    if "error" in payload:
        lines.append(f"error: {payload['error']}")
    return "\n".join(lines)


def html_report_table(rows: list[dict[str, Any]],
                      columns: list[str] | None = None) -> str:
    """Minimal dependency-free HTML table (the reference uses jinja in
    push/alert.py; the content contract — one row per rule with status —
    is what matters). Values are HTML-escaped."""
    import html as _html

    if not rows:
        return "<p>no rows</p>"
    cols = columns or list(rows[0].keys())
    th = "".join(f"<th>{_html.escape(str(c))}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(
            f"<td>{_html.escape(str(r.get(c, '')))}</td>" for c in cols)
        + "</tr>"
        for r in rows)
    return (f"<table border=1><thead><tr>{th}</tr></thead>"
            f"<tbody>{body}</tbody></table>")


def text_notifier(
    send: Callable[[str, str], None],
    *,
    subject_prefix: str = "[spark-expectations]",
) -> Notifier:
    """Adapter: any (subject, body) sender — SMTP, Slack chat.postMessage,
    a ticket API — becomes a Notifier. The engine formats; the caller
    transports. This is the seam the reference fills with five vendor
    plugins."""

    def notify(event: Event, payload: dict[str, Any]) -> None:
        body = format_notification_text(event, payload)
        send(f"{subject_prefix} {event}: "
             f"{payload.get('product_id', '?')}/{payload.get('table_name', '?')}",
             body)

    return notify


# ---------------------------------------------------------------------------
# Channel-native payload formatters (reference notifications/plugins/
# slack.py, teams.py, zoom.py, pagerduty.py). Pure functions over the
# (event, payload) the hub emits — golden-dict testable with no HTTP —
# wired through webhook_notifier's ``formatter`` seam.
# ---------------------------------------------------------------------------

def slack_payload(event: Event, payload: dict[str, Any]) -> dict[str, Any]:
    """Slack incoming-webhook body (reference slack.py:36-38): a single
    ``text`` field carrying the formatted message block."""
    return {"text": format_notification_text(event, payload)}


def teams_payload(event: Event, payload: dict[str, Any]) -> dict[str, Any]:
    """Teams webhook card (reference teams.py:38-48): fixed title and
    theme color plus the message with newlines doubled (Teams renders
    single newlines as spaces)."""
    text = format_notification_text(event, payload).replace("\n", "\n\n")
    return {"title": "SE Notification", "themeColor": "008000",
            "text": text}


#: Zoom's chat webhook takes the same card shape as Teams (reference
#: zoom.py:38-48) — auth differs (a Bearer token header), not the body.
zoom_payload = teams_payload

#: Events that open a PagerDuty incident (reference pagerduty.py
#: _is_failure_notification: job failures and threshold breaches page;
#: start/completion/ignored-rule digests explicitly do not).
_PAGERDUTY_EVENTS = frozenset({"failure", "error_threshold",
                               "rule_threshold"})


def pagerduty_payload(event: Event, payload: dict[str, Any],
                      routing_key: str) -> dict[str, Any] | None:
    """PagerDuty Events-API-v2 trigger (reference pagerduty.py:139-155):
    incident summary + a (product, table)-keyed dedup_key so repeated
    failures of the same run target consolidate into one incident.
    Returns ``None`` for non-failure events — the reference's
    failure-only gate, expressed on the event enum instead of message
    regexes."""
    if event not in _PAGERDUTY_EVENTS:
        return None
    product = payload.get("product_id", "unknown_product")
    table = payload.get("table_name", "unknown_table")
    return {
        "routing_key": routing_key,
        "dedup_key": f"spark_expectations_{product}_{table}_failure",
        "event_action": "trigger",
        "payload": {
            "summary": format_notification_text(event, payload),
            "source": "Spark Expectations",
            "severity": "error",
        },
    }


def slack_notifier(url: str, **kw: Any) -> Notifier:
    """Slack incoming-webhook notifier (reference plugins/slack.py)."""
    return webhook_notifier(url, formatter=slack_payload, **kw)


def teams_notifier(url: str, **kw: Any) -> Notifier:
    """Teams webhook notifier (reference plugins/teams.py)."""
    return webhook_notifier(url, formatter=teams_payload, **kw)


def zoom_notifier(url: str, token: str, *, secret_resolver: Any = None,
                  **kw: Any) -> Notifier:
    """Zoom chat-webhook notifier (reference plugins/zoom.py): Teams'
    card shape plus a Bearer token header. ``token`` may be a
    ``secret://`` ref resolved at send time."""
    return webhook_notifier(
        url, formatter=zoom_payload, secret_resolver=secret_resolver,
        headers={"Authorization": f"Bearer {token}"}, **kw)


def pagerduty_notifier(url: str, routing_key: str, *,
                       secret_resolver: Any = None, **kw: Any) -> Notifier:
    """PagerDuty Events-API notifier (reference plugins/pagerduty.py).
    ``routing_key`` (the integration key) may be a ``secret://`` ref —
    resolved at send time, never stored in the payload closure."""

    def fmt(event: Event, payload: dict[str, Any]) -> dict[str, Any] | None:
        from .secrets import resolve_value

        return pagerduty_payload(
            event, payload, resolve_value(routing_key, secret_resolver))

    return webhook_notifier(
        url, formatter=fmt, secret_resolver=secret_resolver, **kw)


def email_notifier(
    host: str,
    port: int,
    sender: str,
    recipients: list[str],
    *,
    subject: str | None = None,
    use_html_report: bool = False,
    report_rows: Callable[[dict[str, Any]], list[dict[str, Any]]] | None = None,
    smtp_factory: Callable[..., Any] | None = None,
    smtp_password: str | None = None,
    secret_resolver: Any = None,
) -> Notifier:
    """SMTP notifier (reference notifications/plugins/email.py). The SMTP
    client is injected via ``smtp_factory`` (defaults to
    ``smtplib.SMTP``) so environments without a mail relay can still
    construct and test the full message assembly. ``smtp_password`` (a
    literal or a ``secret://`` ref resolved through ``secret_resolver``)
    triggers a ``login(sender, password)`` before send — the reference's
    smtp-auth path with the credential routed through the secrets seam."""
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    def notify(event: Event, payload: dict[str, Any]) -> None:
        msg = MIMEMultipart("alternative")
        msg["Subject"] = subject or (
            f"[spark-expectations] {event}: "
            f"{payload.get('product_id', '?')}/"
            f"{payload.get('table_name', '?')}")
        msg["From"] = sender
        msg["To"] = ", ".join(recipients)
        msg.attach(MIMEText(format_notification_text(event, payload), "plain"))
        if use_html_report and report_rows is not None:
            msg.attach(MIMEText(html_report_table(report_rows(payload)), "html"))
        factory = smtp_factory
        if factory is None:
            import smtplib
            factory = smtplib.SMTP
        with factory(host, port) as client:
            if smtp_password is not None:
                from .secrets import resolve_value
                client.login(sender, resolve_value(smtp_password, secret_resolver))
            client.sendmail(sender, recipients, msg.as_string())

    return notify
