"""Connection DDL family (FLIP-529; reference flink-sql-parser
ddl/connection/SqlCreateConnection.java,
SqlAlterConnection{Set,Reset,Rename}.java, SqlDropConnection.java; dql
SqlShowConnections.java, SqlShowCreateConnection.java,
SqlRichDescribeConnection.java; catalog objects
flink-table-common/.../catalog/CatalogConnection.java +
SensitiveConnection.java; factory DefaultConnectionFactory.java with
FactoryUtil.CONNECTION_TYPE discovery).

A connection is a named, reusable bundle of access options (endpoint,
credentials, ...) that models reference instead of embedding secrets in
every CREATE MODEL. Sensitive option values are extracted into a secret
store at create time (DefaultConnectionFactory.createConnection): the
catalog object keeps only non-sensitive options plus an opaque secret
reference under the reserved key, and every user-visible rendering
(SHOW CREATE CONNECTION, DESCRIBE CONNECTION EXTENDED) masks secret
values as '****' (CreateConnectionOperation.MASKED_VALUE).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_OPT_RE = re.compile(r"'(?P<k>[^']+)'\s*=\s*'(?P<v>[^']*)'")

#: DefaultConnectionFactory.SENSITIVE_FIELD_NAMES — option keys whose
#: values go to the secret store and render masked.
SENSITIVE_FIELD_NAMES = frozenset({
    "password",
    "secret",
    "fs.azure.account.key",
    "apikey",
    "api-key",
    "auth-params",
    "service-key",
    "token",
    "basic-auth",
    "jaas.config",
    "http-headers",
})

#: DefaultConnectionFactory.SECRET_REFERENCE_KEY — reserved; rejected in
#: user-supplied options.
SECRET_REFERENCE_KEY = "__flink.encrypted-secret-key__"

MASKED_VALUE = "****"

CONN_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?:(?P<temp>TEMPORARY)\s+)?CONNECTION\s+"
    r"(?:(?P<ine>IF\s+NOT\s+EXISTS)\s+)?(?P<name>[\w.]+)\s*"
    r"(?:COMMENT\s+'(?P<cmt>[^']*)'\s*)?"
    r"WITH\s*\(\s*(?P<opts>.*?)\s*\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
CONN_ALTER_SET_RE = re.compile(
    r"^\s*ALTER\s+CONNECTION\s+(?:(?P<ife>IF\s+EXISTS)\s+)?(?P<name>[\w.]+)"
    r"\s+SET\s*\(\s*(?P<opts>.*?)\s*\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
CONN_ALTER_RESET_RE = re.compile(
    r"^\s*ALTER\s+CONNECTION\s+(?:(?P<ife>IF\s+EXISTS)\s+)?(?P<name>[\w.]+)"
    r"\s+RESET\s*\(\s*(?P<keys>.*?)\s*\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
CONN_ALTER_RENAME_RE = re.compile(
    r"^\s*ALTER\s+CONNECTION\s+(?:(?P<ife>IF\s+EXISTS)\s+)?(?P<name>[\w.]+)"
    r"\s+RENAME\s+TO\s+(?P<new>[\w.]+)\s*$",
    re.IGNORECASE,
)
CONN_DROP_RE = re.compile(
    r"^\s*DROP\s+(?:TEMPORARY\s+)?CONNECTION\s+"
    r"(?:(?P<ife>IF\s+EXISTS)\s+)?(?P<name>[\w.]+)\s*$",
    re.IGNORECASE,
)
SHOW_CONNECTIONS_RE = re.compile(
    r"^\s*SHOW\s+CONNECTIONS"
    r"(?:\s+(?P<not>NOT\s+)?LIKE\s+'(?P<pat>[^']*)')?\s*$",
    re.IGNORECASE,
)
SHOW_CREATE_CONN_RE = re.compile(
    r"^\s*SHOW\s+CREATE\s+CONNECTION\s+(?P<name>[\w.]+)\s*$",
    re.IGNORECASE,
)
DESC_CONN_RE = re.compile(
    r"^\s*(?:DESCRIBE|DESC)\s+CONNECTION\s+(?:(?P<ext>EXTENDED)\s+)?"
    r"(?P<name>[\w.]+)\s*$",
    re.IGNORECASE,
)


@dataclass
class ConnectionSpec:
    """One catalog connection (reference CatalogConnection: options +
    comment; sensitive values live in the secret store, referenced by
    ``options[SECRET_REFERENCE_KEY]``)."""

    name: str
    options: dict[str, str] = field(default_factory=dict)  # non-sensitive
    comment: str | None = None
    temporary: bool = False

    @property
    def conn_type(self) -> str:
        # FactoryUtil.CONNECTION_TYPE: 'type' option, default 'default'
        return self.options.get("type", "default")


class ConnectionManager:
    """Catalog connection registry + the in-memory WritableSecretStore
    stand-in (reference CatalogManager.createConnection → the factory
    splits sensitive from non-sensitive options)."""

    def __init__(self, spark) -> None:
        self.spark = spark
        self.connections: dict[str, ConnectionSpec] = {}
        self._secrets: dict[str, dict[str, str]] = {}
        self._secret_seq = 0

    # -- secret store ------------------------------------------------------

    def _store_secret(self, sensitive: dict[str, str]) -> str:
        self._secret_seq += 1
        sid = f"secret-{self._secret_seq}"
        self._secrets[sid] = dict(sensitive)
        return sid

    def resolved_options(self, name: str) -> dict[str, str]:
        """Full option map with secrets resolved back in — what a
        provider factory consuming the connection sees (reference: the
        runtime reads the secret store through the reference key)."""
        spec = self._get(name)
        out = {k: v for k, v in spec.options.items()
               if k != SECRET_REFERENCE_KEY}
        sid = spec.options.get(SECRET_REFERENCE_KEY)
        if sid:
            out.update(self._secrets.get(sid, {}))
        return out

    # -- DDL ---------------------------------------------------------------

    def _get(self, name: str) -> ConnectionSpec:
        if name not in self.connections:
            raise ValueError(
                f"Connection with the identifier '{name}' doesn't exist."
            )
        return self.connections[name]

    def create(self, m: re.Match):
        name = m.group("name")
        if name in self.connections:
            if m.group("ine"):
                return None
            raise ValueError(
                f"Connection with the identifier '{name}' already exists."
            )
        options = {o.group("k"): o.group("v")
                   for o in _OPT_RE.finditer(m.group("opts"))}
        if SECRET_REFERENCE_KEY in options:
            raise ValueError(
                f"Connection option '{SECRET_REFERENCE_KEY}' is reserved "
                "and cannot be set by users."
            )
        sensitive = {k: v for k, v in options.items()
                     if k in SENSITIVE_FIELD_NAMES}
        stored = {k: v for k, v in options.items()
                  if k not in SENSITIVE_FIELD_NAMES}
        if sensitive:
            stored[SECRET_REFERENCE_KEY] = self._store_secret(sensitive)
        self.connections[name] = ConnectionSpec(
            name=name,
            options=stored,
            comment=m.group("cmt"),
            temporary=bool(m.group("temp")),
        )
        return None

    def alter_set(self, m: re.Match):
        name = m.group("name")
        if name not in self.connections and m.group("ife"):
            return None
        spec = self._get(name)
        new = {o.group("k"): o.group("v")
               for o in _OPT_RE.finditer(m.group("opts"))}
        if SECRET_REFERENCE_KEY in new:
            raise ValueError(
                f"Connection option '{SECRET_REFERENCE_KEY}' is reserved "
                "and cannot be set by users."
            )
        sensitive = {k: v for k, v in new.items()
                     if k in SENSITIVE_FIELD_NAMES}
        for k, v in new.items():
            if k not in SENSITIVE_FIELD_NAMES:
                spec.options[k] = v
        if sensitive:
            sid = spec.options.get(SECRET_REFERENCE_KEY)
            if sid is None:
                spec.options[SECRET_REFERENCE_KEY] = self._store_secret(
                    sensitive
                )
            else:
                self._secrets[sid].update(sensitive)
        return None

    def alter_reset(self, m: re.Match):
        name = m.group("name")
        if name not in self.connections and m.group("ife"):
            return None
        spec = self._get(name)
        keys = [k.strip().strip("'") for k in m.group("keys").split(",")
                if k.strip()]
        for k in keys:
            if k == "type":
                # ALTER CONNECTION RESET cannot drop the discovery option
                # back past its default (FactoryUtil.CONNECTION_TYPE has
                # default 'default') — resetting just restores the default
                spec.options.pop("type", None)
                continue
            if k in SENSITIVE_FIELD_NAMES:
                sid = spec.options.get(SECRET_REFERENCE_KEY)
                if sid:
                    self._secrets[sid].pop(k, None)
                    if not self._secrets[sid]:
                        del self._secrets[sid]
                        spec.options.pop(SECRET_REFERENCE_KEY, None)
                continue
            spec.options.pop(k, None)
        return None

    def alter_rename(self, m: re.Match):
        name = m.group("name")
        if name not in self.connections and m.group("ife"):
            return None
        spec = self._get(name)
        new = m.group("new")
        if new in self.connections:
            raise ValueError(
                f"Connection with the identifier '{new}' already exists."
            )
        del self.connections[name]
        spec.name = new
        self.connections[new] = spec
        return None

    def drop(self, m: re.Match):
        name = m.group("name")
        if name not in self.connections:
            if m.group("ife"):
                return None
            raise ValueError(
                f"Connection with the identifier '{name}' doesn't exist."
            )
        spec = self.connections.pop(name)
        sid = spec.options.get(SECRET_REFERENCE_KEY)
        if sid:
            self._secrets.pop(sid, None)
        return None

    # -- DQL ---------------------------------------------------------------

    def show(self, m: re.Match):
        names = sorted(self.connections)
        pat = m.group("pat")
        if pat is not None:
            rx = re.compile(
                "^" + re.escape(pat).replace("%", ".*").replace("_", ".")
                + "$"
            )
            hit = [n for n in names if rx.match(n)]
            names = ([n for n in names if n not in hit]
                     if m.group("not") else hit)
        return self.spark.createDataFrame(
            [(n,) for n in names], "connection_name string"
        )

    def _masked_options(self, spec: ConnectionSpec) -> list[tuple[str, str]]:
        sid = spec.options.get(SECRET_REFERENCE_KEY)
        rows = [(k, v) for k, v in spec.options.items()
                if k != SECRET_REFERENCE_KEY]
        if sid:
            rows += [(k, MASKED_VALUE) for k in self._secrets.get(sid, {})]
        return sorted(rows)

    def show_create(self, m: re.Match):
        spec = self._get(m.group("name"))
        parts = [
            "CREATE "
            + ("TEMPORARY " if spec.temporary else "")
            + f"CONNECTION {spec.name}"
        ]
        if spec.comment:
            parts.append(f"COMMENT '{spec.comment}'")
        opts = ", ".join(
            f"'{k}' = '{v}'" for k, v in self._masked_options(spec)
        )
        parts.append(f"WITH ({opts})")
        return self.spark.createDataFrame(
            [("\n".join(parts),)], "result string"
        )

    def describe(self, m: re.Match):
        spec = self._get(m.group("name"))
        rows = [("name", spec.name), ("type", spec.conn_type),
                ("comment", spec.comment or "")]
        if m.group("ext"):
            rows += [(f"option:{k}", v)
                     for k, v in self._masked_options(spec)]
        return self.spark.createDataFrame(
            rows, "info_name string, info_value string"
        )

    def handle(self, stmt: str):
        """Dispatch a connection statement; returns NotImplemented when
        the statement is not part of this family."""
        for rx, h in (
            (CONN_CREATE_RE, self.create),
            (CONN_ALTER_SET_RE, self.alter_set),
            (CONN_ALTER_RESET_RE, self.alter_reset),
            (CONN_ALTER_RENAME_RE, self.alter_rename),
            (CONN_DROP_RE, self.drop),
            (SHOW_CONNECTIONS_RE, self.show),
            (SHOW_CREATE_CONN_RE, self.show_create),
            (DESC_CONN_RE, self.describe),
        ):
            m = rx.match(stmt)
            if m:
                return h(m)
        return NotImplemented
