"""Secret resolution seam for sink / notification credentials.

The reference routes every credential lookup through a pluggable secrets
backend (``spark_expectations/secrets/__init__.py:17-108``: a pluggy hook
spec with Cerberus and Databricks implementations behind a
``SparkExpectationsSecretsBackend.get_secret`` facade). This module is the
Spark-first equivalent with the vendor clients cut out (declared non-goal
— neither SDK exists in this environment): the same *seam*, as a plain
protocol any callable can implement, plus the two backends that need no
vendor code (env vars and an explicit dict).

Config values opt into resolution with a ``secret://<key>`` prefix —
anything else passes through untouched, so resolved and literal options
mix freely in one dict:

    opts = {"kafka.sasl.jaas.config": "secret://KAFKA_JAAS", "topic": "t"}
    resolve_options(opts, EnvSecretResolver())

Vendor backends (Cerberus, Databricks, cloud secret managers) plug in by
implementing ``resolve(key) -> str`` — nothing else in the engine knows
where secrets come from.
"""

from __future__ import annotations

import os
from typing import Callable, Mapping, Optional, Protocol, Sequence, runtime_checkable

SECRET_PREFIX = "secret://"


@runtime_checkable
class SecretResolver(Protocol):
    """Anything with ``resolve(key) -> str``. Raise ``KeyError`` for
    unknown keys so misconfiguration fails loudly at assembly time, not
    as an auth error inside the Kafka client."""

    def resolve(self, key: str) -> str:  # pragma: no cover - protocol
        ...


class EnvSecretResolver:
    """Secrets from environment variables, optionally namespaced:
    ``EnvSecretResolver(prefix="SE_")`` resolves ``secret://TOKEN`` from
    ``$SE_TOKEN``."""

    def __init__(self, prefix: str = "", env: Optional[Mapping[str, str]] = None):
        self._prefix = prefix
        self._env = env if env is not None else os.environ

    def resolve(self, key: str) -> str:
        name = self._prefix + key
        if name not in self._env:
            raise KeyError(f"secret {key!r}: environment variable {name!r} not set")
        return self._env[name]


class DictSecretResolver:
    """Secrets from an explicit mapping — unit tests and notebook use."""

    def __init__(self, secrets: Mapping[str, str]):
        self._secrets = dict(secrets)

    def resolve(self, key: str) -> str:
        if key not in self._secrets:
            raise KeyError(f"secret {key!r} not found")
        return self._secrets[key]


class CallableSecretResolver:
    """Adapter for a bare ``key -> value`` function (e.g. a closure over a
    vendor SDK client) so callers don't have to define a class."""

    def __init__(self, fn: Callable[[str], str]):
        self._fn = fn

    def resolve(self, key: str) -> str:
        return self._fn(key)


class ChainSecretResolver:
    """First resolver that knows the key wins; KeyError if none do."""

    def __init__(self, resolvers: Sequence[SecretResolver]):
        self._resolvers = list(resolvers)

    def resolve(self, key: str) -> str:
        for r in self._resolvers:
            try:
                return r.resolve(key)
            except KeyError:
                continue
        raise KeyError(f"secret {key!r} not found in any resolver")


def is_secret_ref(value: object) -> bool:
    return isinstance(value, str) and value.startswith(SECRET_PREFIX)


def resolve_value(value: str, resolver: Optional[SecretResolver]) -> str:
    """Resolve one ``secret://`` reference; pass anything else through."""
    if not is_secret_ref(value):
        return value
    if resolver is None:
        raise ValueError(
            f"option value {value!r} is a secret reference but no "
            "SecretResolver was provided")
    return resolver.resolve(value[len(SECRET_PREFIX):])


def resolve_options(
    options: Mapping[str, str], resolver: Optional[SecretResolver]
) -> dict[str, str]:
    """Resolve every ``secret://`` value in an options dict. The returned
    dict is a copy; the input (which may be logged / persisted in config)
    never holds plaintext secrets."""
    return {k: resolve_value(v, resolver) for k, v in options.items()}
