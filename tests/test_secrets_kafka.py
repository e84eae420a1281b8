"""Secrets seam + Kafka option synthesis (pure config logic, no broker)."""

import pytest

from spark_expectations_spark.secrets import (
    CallableSecretResolver, ChainSecretResolver, DictSecretResolver,
    EnvSecretResolver, is_secret_ref, resolve_options, resolve_value,
)
from spark_expectations_spark.sinks.kafka import (
    kafka_write_options, local_kafka_options, oauth_kafka_options,
)


class TestResolvers:
    def test_dict_resolver(self):
        r = DictSecretResolver({"tok": "s3cret"})
        assert r.resolve("tok") == "s3cret"
        with pytest.raises(KeyError):
            r.resolve("nope")

    def test_env_resolver_with_prefix(self):
        r = EnvSecretResolver(prefix="SE_", env={"SE_TOKEN": "abc"})
        assert r.resolve("TOKEN") == "abc"
        with pytest.raises(KeyError, match="SE_MISSING"):
            r.resolve("MISSING")

    def test_chain_first_hit_wins(self):
        r = ChainSecretResolver([
            DictSecretResolver({"a": "1"}),
            DictSecretResolver({"a": "2", "b": "3"}),
        ])
        assert r.resolve("a") == "1"
        assert r.resolve("b") == "3"
        with pytest.raises(KeyError):
            r.resolve("c")

    def test_callable_adapter(self):
        r = CallableSecretResolver(lambda k: k.upper())
        assert r.resolve("x") == "X"

    def test_resolve_value_passthrough_and_ref(self):
        r = DictSecretResolver({"k": "v"})
        assert resolve_value("plain", r) == "plain"
        assert resolve_value("secret://k", r) == "v"
        assert is_secret_ref("secret://k") and not is_secret_ref("plain")

    def test_ref_without_resolver_fails_loudly(self):
        with pytest.raises(ValueError, match="no\\s+SecretResolver"):
            resolve_value("secret://k", None)

    def test_resolve_options_copies(self):
        src = {"topic": "t", "kafka.sasl.jaas.config": "secret://jaas"}
        out = resolve_options(src, DictSecretResolver({"jaas": "J"}))
        assert out == {"topic": "t", "kafka.sasl.jaas.config": "J"}
        assert src["kafka.sasl.jaas.config"] == "secret://jaas"  # input untouched


class TestKafkaOptionSynthesis:
    """Golden dicts mirroring reference sinks/utils/writer.py:752-799."""

    def test_local_shape(self):
        assert local_kafka_options("dq-stats") == {
            "kafka.bootstrap.servers": "localhost:9092",
            "topic": "dq-stats",
            "failOnDataLoss": "true",
        }

    def test_modern_oauth_golden(self):
        r = DictSecretResolver({"cid": "my-client", "csec": "my-secret",
                                "boot": "b1:9093,b2:9093",
                                "tep": "https://auth/token"})
        opts = oauth_kafka_options(
            topic="dq-stats", bootstrap_servers="secret://boot",
            client_id="secret://cid", client_secret="secret://csec",
            token_endpoint="secret://tep", resolver=r)
        assert opts == {
            "kafka.bootstrap.servers": "b1:9093,b2:9093",
            "kafka.security.protocol": "SASL_SSL",
            "kafka.sasl.mechanism": "OAUTHBEARER",
            "topic": "dq-stats",
            "kafka.sasl.jaas.config": (
                "org.apache.kafka.common.security.oauthbearer."
                'OAuthBearerLoginModule required clientId="my-client" '
                'clientSecret="my-secret";'),
            "kafka.sasl.oauthbearer.token.endpoint.url": "https://auth/token",
            "kafka.sasl.login.callback.handler.class": (
                "org.apache.kafka.common.security.oauthbearer.secured."
                "OAuthBearerLoginCallbackHandler"),
        }

    def test_legacy_strimzi_golden(self):
        opts = oauth_kafka_options(
            topic="t", bootstrap_servers="b:9093", client_id="c",
            client_secret="s", token_endpoint="https://auth/token",
            legacy_strimzi=True)
        assert opts["kafka.sasl.jaas.config"] == (
            "org.apache.kafka.common.security.oauthbearer."
            "OAuthBearerLoginModule required oauth.client.id='c' "
            "oauth.client.secret='s' "
            "oauth.token.endpoint.uri='https://auth/token';")
        assert opts["kafka.sasl.login.callback.handler.class"] == (
            "io.strimzi.kafka.oauth.client.JaasClientOauthLoginCallbackHandler")

    def test_legacy_requires_endpoint(self):
        with pytest.raises(ValueError, match="token_endpoint"):
            oauth_kafka_options(topic="t", bootstrap_servers="b",
                                client_id="c", client_secret="s",
                                legacy_strimzi=True)

    def test_shaded_prefix(self):
        opts = oauth_kafka_options(
            topic="t", bootstrap_servers="b", client_id="c",
            client_secret="s", shaded_prefix="kafkashaded.")
        assert opts["kafka.sasl.jaas.config"].startswith(
            "kafkashaded.org.apache.kafka")
        assert opts["kafka.sasl.login.callback.handler.class"].startswith(
            "kafkashaded.org.apache.kafka")

    def test_modern_jaas_escapes_quotes_and_backslashes(self):
        """A secret containing '"' or '\\' must not terminate the JAAS
        string or inject extra options."""
        opts = oauth_kafka_options(
            topic="t", bootstrap_servers="b", client_id='c"x',
            client_secret='p\\q" sasl.evil="1')
        jaas = opts["kafka.sasl.jaas.config"]
        assert 'clientId="c\\"x"' in jaas
        assert 'clientSecret="p\\\\q\\" sasl.evil=\\"1";' in jaas
        # exactly one unescaped terminator, at the end
        assert jaas.endswith(";") and jaas.count(";") == 1

    def test_legacy_rejects_jaas_metacharacters(self):
        with pytest.raises(ValueError, match="metacharacter"):
            oauth_kafka_options(
                topic="t", bootstrap_servers="b", client_id="c",
                client_secret="s'; oauth.evil='1",
                token_endpoint="https://auth/token", legacy_strimzi=True)

    def test_legacy_rejects_backslash(self):
        """r5 review fix: Kafka's StreamTokenizer JAAS parser processes
        backslash escapes even inside single quotes — a trailing
        backslash would swallow the closing quote."""
        with pytest.raises(ValueError, match="metacharacter"):
            oauth_kafka_options(
                topic="t", bootstrap_servers="b", client_id="c",
                client_secret="secret-ending-in\\",
                token_endpoint="https://auth/token", legacy_strimzi=True)

    def test_env_dispatch_local(self):
        opts = kafka_write_options(env="local", topic="t")
        assert opts["failOnDataLoss"] == "true"

    def test_env_dispatch_prod_requires_credentials(self):
        with pytest.raises(ValueError, match="client_id"):
            kafka_write_options(env="prod", topic="t",
                                bootstrap_servers="b", client_secret="s")


class TestNotifierSecretThreading:
    def test_email_login_resolves_secret(self):
        from spark_expectations_spark.notifications import email_notifier

        calls = {}

        class FakeSMTP:
            def __init__(self, host, port):
                calls["conn"] = (host, port)
            def __enter__(self):
                return self
            def __exit__(self, *a):
                return False
            def login(self, user, password):
                calls["login"] = (user, password)
            def sendmail(self, sender, rcpt, msg):
                calls["sent"] = (sender, tuple(rcpt))

        n = email_notifier(
            "smtp.host", 25, "me@x", ["a@x"],
            smtp_factory=FakeSMTP, smtp_password="secret://pw",
            secret_resolver=DictSecretResolver({"pw": "hunter2"}))
        n("completion", {"product_id": "p", "table_name": "t"})
        assert calls["login"] == ("me@x", "hunter2")
        assert calls["sent"][0] == "me@x"

    def test_webhook_resolves_url_and_headers(self, monkeypatch):
        from spark_expectations_spark import notifications as no

        seen = {}

        def fake_urlopen(req, timeout=None):
            seen["url"] = req.full_url
            seen["auth"] = req.headers.get("Authorization")
            class R:  # noqa: N801 - minimal response stub
                pass
            return R()

        import urllib.request
        monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
        n = no.webhook_notifier(
            "secret://hook", headers={"Authorization": "secret://tok"},
            secret_resolver=DictSecretResolver(
                {"hook": "https://h/x", "tok": "Bearer abc"}))
        n("failure", {"product_id": "p"})
        assert seen == {"url": "https://h/x", "auth": "Bearer abc"}
