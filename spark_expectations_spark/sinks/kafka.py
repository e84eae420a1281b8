"""Kafka sink option synthesis — pure config-dict logic, broker-free.

The reference assembles its stats-topic writer options in
``sinks/utils/writer.py:752-799``: a ``local`` plaintext shape, a modern
SASL/OAUTHBEARER shape (Kafka 3.x built-in OAuth classes), and a legacy
Strimzi-callback shape for old runtimes, with every credential pulled
through the secrets backend. This module reproduces that synthesis as
testable pure functions (VERDICT r01 item 7): no broker, no classpath —
the env-gated ``stats_to_kafka`` writer consumes the resulting dict
unchanged.

Differences from the reference, deliberate:

* Class names default to the PUBLIC Apache Kafka packages
  (``org.apache.kafka...``); the reference hard-codes a vendor-shaded
  ``kafkashaded.`` prefix. Pass ``shaded_prefix="kafkashaded."`` to
  target such runtimes.
* Credentials are ``secret://`` references resolved through the
  :mod:`..secrets` seam instead of a baked-in vendor plugin pair.
"""

from __future__ import annotations

from typing import Optional

from ..secrets import SecretResolver, resolve_value

_OAUTH_MODULE = "org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginModule"
_OAUTH_CALLBACK = (
    "org.apache.kafka.common.security.oauthbearer.secured."
    "OAuthBearerLoginCallbackHandler"
)
_STRIMZI_CALLBACK = "io.strimzi.kafka.oauth.client.JaasClientOauthLoginCallbackHandler"


def _jaas_dquote(value: str) -> str:
    """Double-quote a JAAS option value, escaping backslashes and quotes —
    a secret containing ``"`` or ``\\`` must not terminate the string or
    inject extra JAAS options."""
    return '"' + value.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _jaas_squote(value: str) -> str:
    """Single-quote a value for the legacy Strimzi JAAS shape. Escaping
    inside single quotes is not portably defined across JAAS parsers, so
    metacharacters are rejected outright rather than smuggled through."""
    if any(c in value for c in ("'", "\\", ";", "\n", "\r", "\0")):
        # backslash included: Kafka's StreamTokenizer-based JAAS parser
        # processes \-escapes even inside single quotes, so a trailing
        # backslash would swallow the closing quote
        raise ValueError(
            "secret/endpoint contains a JAAS metacharacter (' \\ ; or a "
            "control char) unsupported in the legacy single-quoted shape; "
            "use the modern OAuth shape or rotate the credential")
    return "'" + value + "'"


def local_kafka_options(
    topic: str, *, bootstrap_servers: str = "localhost:9092"
) -> dict[str, str]:
    """Plaintext local/dev shape (reference writer.py:755-760)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "failOnDataLoss": "true",
    }


def oauth_kafka_options(
    *,
    topic: str,
    bootstrap_servers: str,
    client_id: str,
    client_secret: str,
    token_endpoint: Optional[str] = None,
    resolver: Optional[SecretResolver] = None,
    shaded_prefix: str = "",
    legacy_strimzi: bool = False,
) -> dict[str, str]:
    """SASL_SSL + OAUTHBEARER writer options (reference writer.py:762-799).

    ``client_id`` / ``client_secret`` / ``token_endpoint`` /
    ``bootstrap_servers`` / ``topic`` may each be a ``secret://`` ref,
    resolved through ``resolver`` at assembly time — mirroring the
    reference's per-field ``secret_handler.get_secret`` calls.

    ``legacy_strimzi=True`` emits the deprecated Strimzi-callback shape
    (oauth.* JAAS keys, token endpoint inside the JAAS string) used by
    pre-Kafka-3.x runtimes; the default is the modern built-in OAuth
    shape (clientId/clientSecret JAAS keys + a dedicated
    ``sasl.oauthbearer.token.endpoint.url`` option).
    """
    boot = resolve_value(bootstrap_servers, resolver)
    top = resolve_value(topic, resolver)
    cid = resolve_value(client_id, resolver)
    csec = resolve_value(client_secret, resolver)
    tep = resolve_value(token_endpoint, resolver) if token_endpoint else None

    base = {
        "kafka.bootstrap.servers": boot,
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "OAUTHBEARER",
        "topic": top,
    }
    if legacy_strimzi:
        if tep is None:
            raise ValueError("legacy_strimzi OAuth requires token_endpoint")
        jaas = (
            f"{shaded_prefix}{_OAUTH_MODULE} required "
            f"oauth.client.id={_jaas_squote(cid)} "
            f"oauth.client.secret={_jaas_squote(csec)} "
            f"oauth.token.endpoint.uri={_jaas_squote(tep)};"
        )
        base["kafka.sasl.jaas.config"] = jaas
        base["kafka.sasl.login.callback.handler.class"] = _STRIMZI_CALLBACK
        return base

    jaas = (
        f'{shaded_prefix}{_OAUTH_MODULE} required '
        f'clientId={_jaas_dquote(cid)} clientSecret={_jaas_dquote(csec)};'
    )
    base["kafka.sasl.jaas.config"] = jaas
    if tep is not None:
        base["kafka.sasl.oauthbearer.token.endpoint.url"] = tep
    base["kafka.sasl.login.callback.handler.class"] = (
        f"{shaded_prefix}{_OAUTH_CALLBACK}" if shaded_prefix else _OAUTH_CALLBACK
    )
    return base


def kafka_write_options(
    *,
    env: str = "local",
    topic: str,
    bootstrap_servers: Optional[str] = None,
    client_id: Optional[str] = None,
    client_secret: Optional[str] = None,
    token_endpoint: Optional[str] = None,
    resolver: Optional[SecretResolver] = None,
    shaded_prefix: str = "",
    legacy_strimzi: bool = False,
) -> dict[str, str]:
    """Environment dispatch, mirroring the reference's
    ``get_kafka_write_options``: ``env="local"`` short-circuits to the
    plaintext shape; anything else requires the OAuth fields."""
    if env == "local":
        return local_kafka_options(
            resolve_value(topic, resolver),
            bootstrap_servers=resolve_value(
                bootstrap_servers or "localhost:9092", resolver),
        )
    missing = [n for n, v in (("bootstrap_servers", bootstrap_servers),
                              ("client_id", client_id),
                              ("client_secret", client_secret)) if not v]
    if missing:
        raise ValueError(f"non-local Kafka config requires {missing}")
    return oauth_kafka_options(
        topic=topic, bootstrap_servers=bootstrap_servers,  # type: ignore[arg-type]
        client_id=client_id, client_secret=client_secret,  # type: ignore[arg-type]
        token_endpoint=token_endpoint, resolver=resolver,
        shaded_prefix=shaded_prefix, legacy_strimzi=legacy_strimzi,
    )
