"""Login/token providers for OUTGOING http connections.

Reference parity: internal/security/login_provider.go (ProviderConfig /
ValueReader / ProviderManager persistence, FindByName semantics),
internal/security/token.go (TokenProviders registry: Add/Update/List/
Get/Delete keyed lower-case, toProvider dispatch on type), internal/
security/clientcredentialsprovider.go (OAuth2 client-credentials
exchange with token caching) and nodeprovider.go (node-signed JWT).
Served at /provider/logins by UdaServer (providerhandler.go:44-48).

Storage is one JSON file with atomic replace (the sidecar-file
durability model content.py and the store registry use) instead of the
reference's BadgerDB index — same contract: providers survive restart,
name is the key.

A provider authorizes a ``urllib.request.Request`` in place (the
reference's ``Provider.Authorize(req *http.Request)``):

* ``basic``  — HTTP Basic from user/password value-readers;
* ``bearer`` — OAuth2 client-credentials exchange against ``endpoint``
  (form-encoded, RFC 6749 §4.4), token cached until expiry;
* ``nodebearer`` — JWT signed locally by an attached SecurityManager
  (node-to-node auth without a token-service round trip).

``token_callable(name)`` adapts any provider to the ``token_provider``
callable the jobs-engine http sources/sinks already accept."""

from __future__ import annotations

import base64
import json
import os
import threading
import time
import urllib.parse
import urllib.request

_WIRE_KEYS = ("user", "password", "key", "secret", "audience", "endpoint")
_ATTRS = {"key": "client_id", "secret": "client_secret"}


def _attr(wire_key: str) -> str:
    return _ATTRS.get(wire_key, wire_key)


class ProviderConfig:
    """login_provider.go:139-153 — name + type plus optional
    ValueReaders (``{"type": "text"|"env", "value": ...}``). Wire JSON
    keys are the reference's: ``key`` carries the client id, ``secret``
    the client secret."""

    def __init__(self, name: str, type: str = "basic", **readers):
        self.name = name
        self.type = type
        for wk in _WIRE_KEYS:
            setattr(self, _attr(wk), readers.pop(_attr(wk), None))
        if readers:
            raise ValueError(f"unknown provider fields: {sorted(readers)}")

    @classmethod
    def from_json(cls, obj: dict) -> "ProviderConfig":
        if not obj.get("name"):
            raise ValueError("provider config needs a name")
        readers = {_attr(k): obj[k] for k in _WIRE_KEYS if obj.get(k)}
        return cls(obj["name"], obj.get("type", "basic"), **readers)

    def to_json(self, mask: bool = False) -> dict:
        """Wire shape; ``mask=True`` hides secret/password values the
        way loginList/loginGet do (providerhandler.go:96-107)."""
        out = {"name": self.name, "type": self.type}
        for wk in _WIRE_KEYS:
            vr = getattr(self, _attr(wk))
            if vr:
                if mask and wk in ("secret", "password") and vr.get("value"):
                    vr = {**vr, "value": "*****"}
                out[wk] = vr
        return out


def load_value(reader: dict | None) -> str:
    """ProviderManager.LoadValue (login_provider.go:86-100): ``text``
    readers carry the value inline, ``env`` readers name a variable."""
    if not reader:
        return ""
    if reader.get("type") == "text":
        return reader.get("value", "")
    if reader.get("type") == "env":
        return os.environ.get(reader.get("value", ""), "")
    return ""


class BasicProvider:
    def __init__(self, user: str, password: str):
        self._header = "Basic " + base64.b64encode(
            f"{user}:{password}".encode()).decode()

    def authorize(self, req: urllib.request.Request) -> None:
        req.add_header("Authorization", self._header)

    def bearer_token(self) -> str:
        raise ValueError("basic provider has no bearer token")


class ClientCredentialsProvider:
    """clientcredentialsprovider.go: POST the client-credentials grant
    to the endpoint, cache the access token, refresh when it is within
    60s of expiry (the reference caches until the token's exp)."""

    REFRESH_MARGIN_S = 60.0

    def __init__(self, cfg: ProviderConfig):
        self._cfg = cfg
        self._token: str | None = None
        self._expires_at = 0.0

    def _fetch(self) -> str:
        form = {
            "grant_type": "client_credentials",
            "client_id": load_value(self._cfg.client_id),
            "client_secret": load_value(self._cfg.client_secret),
        }
        audience = load_value(self._cfg.audience)
        if audience:
            form["audience"] = audience
        req = urllib.request.Request(
            load_value(self._cfg.endpoint),
            data=urllib.parse.urlencode(form).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        with urllib.request.urlopen(req, timeout=30) as resp:
            body = json.loads(resp.read().decode())
        self._token = body["access_token"]
        # expires_in is optional in the response; fall back to the
        # server-side 15-minute TTL (manager.go:464)
        self._expires_at = time.time() + float(body.get("expires_in", 900))
        return self._token

    def bearer_token(self) -> str:
        if self._token is None or \
                time.time() >= self._expires_at - self.REFRESH_MARGIN_S:
            return self._fetch()
        return self._token

    def authorize(self, req: urllib.request.Request) -> None:
        req.add_header("Authorization", f"Bearer {self.bearer_token()}")


class NodeBearerProvider:
    """nodebearer (nodeprovider.go). With an ``endpoint`` configured
    this is the reference's NodeJwtBearerProvider round trip
    (nodeprovider.go:82-129): mint a 1-minute RS256 client assertion
    with the local node key (CreateJWTForTokenRequest), POST the OAuth2
    JWT-bearer grant to the REMOTE node's token endpoint, cache the
    returned access token until its exp. Without an endpoint it signs a
    local token directly — same-node auth without a round trip."""

    REFRESH_MARGIN_S = 30.0

    def __init__(self, security_manager, audience_cfg: dict | None,
                 endpoint_cfg: dict | None = None):
        self._sm = security_manager
        self._audience = audience_cfg
        self._endpoint = endpoint_cfg
        self._token: str | None = None
        self._expires_at = 0.0

    def _remote_exchange(self, endpoint: str) -> str:
        from datahub_spark.security import jwt_unverified_claims

        audience = load_value(self._audience) or endpoint
        assertion = self._sm.create_jwt_for_token_request(audience)
        form = {
            "grant_type": "client_credentials",
            "client_assertion_type":
                "urn:ietf:params:oauth:grant-type:jwt-bearer",
            "client_assertion": assertion,
        }
        req = urllib.request.Request(
            endpoint, data=urllib.parse.urlencode(form).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        with urllib.request.urlopen(req, timeout=30) as resp:
            body = json.loads(resp.read().decode())
        self._token = body["access_token"]
        # cache until the token's own exp (nodeprovider.go:66-80); the
        # remote validates it again anyway, so claims are read unverified
        exp = jwt_unverified_claims(self._token).get("exp")
        self._expires_at = float(exp) if exp else time.time() + 900
        return self._token

    def bearer_token(self) -> str:
        endpoint = load_value(self._endpoint)
        if endpoint:
            if self._token is None or \
                    time.time() >= self._expires_at - self.REFRESH_MARGIN_S:
                return self._remote_exchange(endpoint)
            return self._token
        now = int(time.time())
        aud = load_value(self._audience) or f"node:{self._sm.node_id}"
        return self._sm._sign_claims({
            "sub": f"node:{self._sm.node_id}",
            "roles": ["admin"],
            "iss": f"node:{self._sm.node_id}",
            "aud": aud,
            "iat": now,
            "exp": now + self._sm.TOKEN_TTL_SECONDS,
        })

    def authorize(self, req: urllib.request.Request) -> None:
        req.add_header("Authorization", f"Bearer {self.bearer_token()}")


class ProviderStore:
    """TokenProviders (token.go:23-112): named registry of login
    providers, keyed lower-case, with CRUD the /provider handlers call.
    ``path`` persists configs as one JSON file (atomic replace)."""

    def __init__(self, path: str | None = None, security_manager=None):
        self._path = path
        self._sm = security_manager
        self._configs: dict[str, ProviderConfig] = {}
        self._instances: dict[str, object] = {}
        # served handlers mutate concurrently (ThreadingHTTPServer)
        self._mu = threading.Lock()
        if path and os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                for obj in json.load(f):
                    cfg = ProviderConfig.from_json(obj)
                    self._configs[cfg.name.lower()] = cfg

    def _save(self) -> None:
        if not self._path:
            return
        tmp = self._path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump([c.to_json() for c in self._configs.values()], f)
        os.replace(tmp, self._path)

    # -- CRUD (providerhandler.go surface) --------------------------------

    def add(self, cfg: ProviderConfig) -> None:
        with self._mu:
            key = cfg.name.lower()
            self._configs[key] = cfg
            self._instances.pop(key, None)
            self._save()

    def update(self, name: str, cfg: ProviderConfig) -> None:
        """UpdateProvider (token.go:108): 404s on unknown name; the
        path name wins over the body name."""
        if name.lower() not in self._configs:
            raise KeyError(name)
        cfg.name = name
        self.add(cfg)

    def list(self, mask: bool = True) -> list[dict]:
        return [c.to_json(mask=mask) for c in self._configs.values()]

    def get_config(self, name: str, mask: bool = True) -> dict:
        cfg = self._configs.get(name.lower())
        if cfg is None:
            raise KeyError(name)
        return cfg.to_json(mask=mask)

    def delete(self, name: str) -> None:
        with self._mu:
            if name.lower() not in self._configs:
                raise KeyError(name)
            self._configs.pop(name.lower())
            self._instances.pop(name.lower(), None)
            self._save()

    # -- provider instances (token.go toProvider dispatch) ----------------

    def provider(self, name: str):
        key = name.lower()
        if key in self._instances:
            return self._instances[key]
        cfg = self._configs.get(key)
        if cfg is None:
            raise KeyError(name)
        kind = cfg.type.lower()
        if kind == "bearer":
            inst = ClientCredentialsProvider(cfg)
        elif kind == "nodebearer":
            if self._sm is None:
                raise ValueError("nodebearer provider needs a SecurityManager")
            inst = NodeBearerProvider(self._sm, cfg.audience, cfg.endpoint)
        else:
            inst = BasicProvider(load_value(cfg.user), load_value(cfg.password))
        self._instances[key] = inst
        return inst

    def token_callable(self, name: str):
        """Adapter for the jobs-engine ``token_provider=`` hooks (they
        expect a zero-arg callable returning the raw bearer token)."""
        return lambda: self.provider(name).bearer_token()
