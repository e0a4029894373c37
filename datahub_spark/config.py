"""Boot configuration (internal/conf/config.go analogue).

The reference boots from a viper environment: defaults, overlaid by an
optional ``.env``-format config file, overlaid by process environment
variables (viper.AutomaticEnv — env wins over the file). ``load_config``
reproduces that precedence with the same key names and defaults
(config.go:125-151) for every key that binds to a real feature of this
engine. Keys that configure BadgerDB internals (BLOCK_CACHE_SIZE,
VALUE_LOG_FILE_SIZE, MAX_COMPACTION_LEVELS, FLATTEN_ON_START) or
external infrastructure this engine does not deploy with (DD_AGENT_HOST
statsd, SECRETS_MANAGER, DL_JWT_* datalayer token exchange, OPA) are
accepted but unused; they are surfaced on ``Config.extras`` so a caller
can see what was ignored rather than silently dropping it.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field


_DURATION_RE = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")

_UNIT_SECONDS = {
    "ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3,
    "s": 1.0, "m": 60.0, "h": 3600.0,
}


def parse_duration(text: str) -> float:
    """Go ``time.ParseDuration`` subset -> seconds ("1h", "90m",
    "1h30m", "300ms"). Viper's GetDuration returns 0 for empty/absent;
    callers pass their default instead of 0 explicitly."""
    text = (text or "").strip()
    if not text:
        return 0.0
    sign = 1.0
    if text[0] in "+-":
        sign, text = (1.0 if text[0] == "+" else -1.0), text[1:]
    pos, total = 0, 0.0
    for m in _DURATION_RE.finditer(text):
        if m.start() != pos:
            raise ValueError(f"invalid duration: {text!r}")
        total += float(m.group(1)) * _UNIT_SECONDS[m.group(2)]
        pos = m.end()
    if pos != len(text):
        raise ValueError(f"invalid duration: {text!r}")
    return sign * total


def _parse_bool(text: str, default: bool) -> bool:
    text = (text or "").strip().lower()
    if not text:
        return default
    return text in ("1", "t", "true", "yes", "on")


def read_env_file(path: str) -> dict[str, str]:
    """Parse a ``.env``-format config file: KEY=VALUE lines, ``#``
    comments, optional ``export `` prefix, optional single/double
    quoting of the value."""
    out: dict[str, str] = {}
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):]
            key, _, value = line.partition("=")
            key, value = key.strip(), value.strip()
            if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
                value = value[1:-1]
            elif "#" in value:  # trailing comment on an unquoted value
                value = value.split("#", 1)[0].strip()
            out[key] = value
    return out


@dataclass
class Config:
    """conf.Config analogue — the subset whose keys bind to engine
    features, same names/defaults as config.go:57-97,125-151."""

    profile: str = "local"                 # PROFILE (config.go:44-47)
    port: int = 8080                       # SERVER_PORT
    store_location: str = ""               # STORE_LOCATION (default ~/datahub)
    backup_location: str = ""              # BACKUP_LOCATION ("" = no backups)
    backup_schedule: str = "*/5 * * * *"   # BACKUP_SCHEDULE
    gc_on_startup: bool = True             # GC_ON_STARTUP
    fullsync_lease_timeout: float = 3600.0  # FULLSYNC_LEASE_TIMEOUT (1h)
    auth_middleware: str = "noop"          # AUTHORIZATION_MIDDLEWARE
    opa_endpoint: str = ""                 # OPA_ENDPOINT (config.go:138)
    admin_username: str = ""               # ADMIN_USERNAME
    admin_password: str = ""               # ADMIN_PASSWORD
    node_id: str = "anonymous-node"        # NODE_ID
    security_storage_location: str = ""    # SECURITY_STORAGE_LOCATION
    jobs_max_incremental: int = 10         # JOBS_MAX_INCREMENTAL
    jobs_max_fullsync: int = 10            # JOBS_MAX_FULLSYNC
    slow_log_threshold: float = 1.0        # SLOW_LOG_THRESHOLD (1s)
    log_level: str = "INFO"                # LOG_LEVEL
    # accepted-but-unused reference keys, preserved for visibility
    extras: dict[str, str] = field(default_factory=dict)

    @property
    def security_enabled(self) -> bool:
        # middleware.go:111,129 — "noop" disables; "local"/"on" enable
        # the local client/ACL manager; "opa" enables it with the ALLOW
        # decision delegated to the configured OPA endpoint
        # (security.OpaSecurityManager).
        return self.auth_middleware in ("local", "on", "opa")


_UNUSED_KEYS = (
    "DD_AGENT_HOST", "SECRETS_MANAGER", "TOKEN_WELL_KNOWN",
    "TOKEN_AUDIENCE", "TOKEN_ISSUER", "DL_JWT_CLIENT_ID",
    "DL_JWT_CLIENT_SECRET", "DL_JWT_AUDIENCE", "DL_JWT_GRANT_TYPE",
    "DL_JWT_ENDPOINT", "BLOCK_CACHE_SIZE",
    "VALUE_LOG_FILE_SIZE", "MAX_COMPACTION_LEVELS", "FLATTEN_ON_START",
    "BACKUP_USE_RSYNC", "BACKUP_SOURCE_LOCATION",
)


def load_config(config_file: str | None = None,
                env: dict[str, str] | None = None) -> Config:
    """conf.LoadConfig analogue. Precedence (viper): process env >
    config file > defaults. ``env`` defaults to ``os.environ``; pass a
    dict in tests for hermetic loads."""
    env = dict(os.environ if env is None else env)
    file_vals: dict[str, str] = {}
    if config_file:
        file_vals = read_env_file(config_file)

    def get(key: str, default: str = "") -> str:
        if key in env:
            return env[key]
        if key in file_vals:
            return file_vals[key]
        return default

    home = os.path.expanduser("~") or "/tmp"
    middleware = get("AUTHORIZATION_MIDDLEWARE", "noop")
    opa_endpoint = get("OPA_ENDPOINT", "")
    if middleware == "opa" and not opa_endpoint:
        raise ValueError(
            "AUTHORIZATION_MIDDLEWARE=opa requires OPA_ENDPOINT "
            "(middlewares/opa.go posts each request's {method, path, "
            "token, scopes} to {endpoint}/v1/data/datahub/authz/allow); "
            "without it use 'noop' (open) or 'local'/'on' (Bearer-token "
            "+ local ACLs, datahub_spark.security)")

    lease = get("FULLSYNC_LEASE_TIMEOUT")
    slow = get("SLOW_LOG_THRESHOLD")
    cfg = Config(
        profile=get("PROFILE", "local"),
        port=int(get("SERVER_PORT", "8080")),
        store_location=get("STORE_LOCATION",
                           os.path.join(home, "datahub")),
        backup_location=get("BACKUP_LOCATION", ""),
        backup_schedule=get("BACKUP_SCHEDULE", "*/5 * * * *"),
        gc_on_startup=_parse_bool(get("GC_ON_STARTUP"), True),
        fullsync_lease_timeout=parse_duration(lease) if lease else 3600.0,
        auth_middleware=middleware,
        opa_endpoint=opa_endpoint,
        admin_username=get("ADMIN_USERNAME", ""),
        admin_password=get("ADMIN_PASSWORD", ""),
        node_id=get("NODE_ID", "anonymous-node"),
        # config.go:147 default {home}/datahubsecurity; holds the node
        # RSA keypair files (node_key / node_key.pub) + client registry
        security_storage_location=get(
            "SECURITY_STORAGE_LOCATION",
            os.path.join(home, "datahubsecurity")),
        jobs_max_incremental=int(get("JOBS_MAX_INCREMENTAL", "10")),
        jobs_max_fullsync=int(get("JOBS_MAX_FULLSYNC", "10")),
        slow_log_threshold=parse_duration(slow) if slow else 1.0,
        log_level=get("LOG_LEVEL", "INFO"),
        extras={k: get(k) for k in _UNUSED_KEYS
                if get(k) not in ("", None)},
    )
    return cfg
