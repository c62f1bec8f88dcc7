"""Model-provider option schemas + validation (reference
flink-models/flink-model-openai OpenAIModelProviderFactory.java +
OpenAIOptions.java, flink-model-triton TritonModelProviderFactory.java +
TritonOptions.java, validated through FactoryUtil's helper the way
``helper.validate()`` does for connector factories).

The providers themselves call HTTP endpoints (env-blocked here — the
reference hits the same wall without a network), but the OPTION SURFACE
is pure metadata: which keys exist, which are required, how values parse
(int/long/double/boolean/duration/enum), and which endpoint shapes
dispatch to which model function. That surface is what a user's CREATE
MODEL statement is validated against, and what this module pins:

- unknown keys   → "Unsupported options found for '<provider>'" listing
  supported keys (FactoryUtil.validateUnconsumedKeys behavior)
- missing keys   → "One or more required options are missing" listing them
- bad values     → "Could not parse value '<v>' for key '<k>'"
- openai endpoint dispatch: '.../chat/completions' → chat function,
  '.../embeddings' → embedding function, else "Unsupported endpoint"
  (OpenAIModelProviderFactory.createModelProvider)
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Opt:
    key: str
    typ: str  # 'string' | 'int' | 'long' | 'double' | 'boolean' | 'duration' | 'map' | enum list via enum_values
    required: bool = False
    default: object = None
    enum_values: tuple = ()


_DURATION_RE = re.compile(r"^\s*(\d+)\s*(ms|s|sec|min|h|d)?\s*$", re.IGNORECASE)


def _parse_value(opt: Opt, raw: str):
    t = opt.typ
    try:
        if t == "string":
            return raw
        if t in ("int", "long"):
            return int(raw)
        if t == "double":
            return float(raw)
        if t == "boolean":
            if raw.lower() in ("true", "false"):
                return raw.lower() == "true"
            raise ValueError(raw)
        if t == "duration":
            if not _DURATION_RE.match(raw):
                raise ValueError(raw)
            return raw
        if t == "map":
            # FactoryUtil map syntax: k1:v1,k2:v2
            out = {}
            for item in raw.split(","):
                if not item.strip():
                    continue
                k, sep, v = item.partition(":")
                if not sep:
                    raise ValueError(raw)
                out[k.strip()] = v.strip()
            return out
        if t == "enum":
            norm = raw.strip().lower().replace("_", "-")
            allowed = {v.lower().replace("_", "-") for v in opt.enum_values}
            if norm not in allowed:
                raise ValueError(raw)
            return norm
    except ValueError:
        raise ValueError(
            f"Could not parse value '{raw}' for key '{opt.key}'."
        ) from None
    raise ValueError(f"unknown option type {t!r} for key {opt.key!r}")


# -- OpenAI (OpenAIOptions.java) -------------------------------------------

OPENAI_OPTIONS = [
    Opt("endpoint", "string", required=True),
    Opt("api-key", "string", required=True),
    Opt("model", "string", required=True),
    Opt("max-context-size", "int"),
    Opt("context-overflow-action", "enum",
        enum_values=("truncated-tail", "truncated-tail-log"),
        default="truncated-tail"),
    Opt("error-handling-strategy", "enum",
        enum_values=("retry", "failover", "ignore"), default="retry"),
    Opt("retry-num", "int", default=100),
    Opt("retry-fallback-strategy", "enum",
        enum_values=("failover", "ignore")),
    Opt("system-prompt", "string", default="You are a helpful assistant."),
    Opt("temperature", "double"),
    Opt("top-p", "double"),
    Opt("stop", "string"),
    Opt("max-tokens", "long"),
    Opt("presence-penalty", "double"),
    Opt("n", "long"),
    Opt("seed", "long"),
    Opt("response-format", "enum", enum_values=("text", "json_object")),
    Opt("dimension", "long"),
]

# -- Triton (TritonOptions.java) -------------------------------------------

TRITON_OPTIONS = [
    Opt("endpoint", "string", required=True),
    Opt("model-name", "string", required=True),
    Opt("model-version", "string", default="latest"),
    Opt("timeout", "duration", default="30s"),
    Opt("flatten-batch-dim", "boolean", default=False),
    Opt("priority", "int"),
    Opt("sequence-id", "string"),
    Opt("sequence-start", "boolean", default=False),
    Opt("sequence-end", "boolean", default=False),
    Opt("compression", "string"),
    Opt("auth-token", "string"),
    Opt("custom-headers", "map"),
    Opt("max-retries", "int"),
    Opt("retry-initial-backoff", "duration"),
    Opt("retry-max-backoff", "duration"),
    Opt("default-value", "string"),
]

_PROVIDERS: dict[str, list[Opt]] = {
    "openai": OPENAI_OPTIONS,
    "triton": TRITON_OPTIONS,
}


def provider_option_keys(provider: str) -> frozenset:
    """Option keys a provider's factory consumes (for filtering options
    inherited from a FLIP-529 connection, which may carry keys meant for
    other providers)."""
    return frozenset(o.key for o in _PROVIDERS.get(provider, ()))

#: endpoint suffix → model function kind
#: (OpenAIChatModelFunction.ENDPOINT_SUFFIX / OpenAIEmbeddingModelFunction)
_OPENAI_CHAT_SUFFIX = "chat/completions"
_OPENAI_EMBEDDING_SUFFIX = "embeddings"


def validate_provider_options(provider: str, options: dict) -> dict:
    """FactoryUtil-shaped validation of a CREATE MODEL WITH-clause for a
    remote provider. Returns the resolved options (defaults applied,
    values parsed) plus ``__function_kind`` for openai endpoint dispatch.
    Raises ValueError with reference-shaped messages on any violation."""
    schema = _PROVIDERS.get(provider)
    if schema is None:
        raise ValueError(f"unknown model provider {provider!r}")
    by_key = {o.key: o for o in schema}
    # 'provider' plays the role FactoryUtil gives 'connector': consumed
    # before validation
    user = {k: v for k, v in options.items() if k != "provider"}

    unknown = sorted(k for k in user if k not in by_key)
    if unknown:
        supported = "\n".join(sorted(by_key))
        raise ValueError(
            f"Unsupported options found for '{provider}'.\n\n"
            "Unsupported options:\n\n" + "\n".join(unknown)
            + "\n\nSupported options:\n\n" + supported
        )
    missing = sorted(
        o.key for o in schema if o.required and o.key not in user
    )
    if missing:
        raise ValueError(
            "One or more required options are missing.\n\n"
            "Missing required options are:\n\n" + "\n".join(missing)
        )
    resolved: dict = {}
    for o in schema:
        if o.key in user:
            resolved[o.key] = _parse_value(o, user[o.key])
        elif o.default is not None:
            resolved[o.key] = o.default

    if provider == "openai":
        # OpenAIModelProviderFactory.createModelProvider: normalize the
        # endpoint (strip trailing slashes, lowercase) then dispatch on
        # its suffix
        endpoint = re.sub(r"/*$", "", resolved["endpoint"]).lower()
        if endpoint.endswith(_OPENAI_EMBEDDING_SUFFIX):
            resolved["__function_kind"] = "embedding"
        elif endpoint.endswith(_OPENAI_CHAT_SUFFIX):
            resolved["__function_kind"] = "chat"
        else:
            raise ValueError(f"Unsupported endpoint: {endpoint}")
    return resolved
