"""Content service: CRUD of named JSON configuration blobs.

Reference parity: internal/content/content.go:28-31 — content objects
are ``{"id": ..., "data": {...}}`` documents stored by id and listed in
full (content_test.go: add, list returns stored objects, update
overwrites, delete removes). Storage here is one JSON file per id under
a root directory with atomic replace writes — the same
sidecar-file durability model as the store registry."""

from __future__ import annotations

import json
import os
import re

_SAFE = re.compile(r"[^A-Za-z0-9._-]")


class ContentService:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, content_id: str) -> str:
        if not content_id:
            raise ValueError("content id must be non-empty")
        # percent-encode per UTF-8 BYTE (always two hex digits) — a
        # codepoint-width escape is not injective: ' ac' (0x20,'a','c')
        # and '€' (0x20AC) would share a file
        fname = _SAFE.sub(
            lambda m: "".join(f"%{b:02x}" for b in m.group(0).encode("utf-8")),
            content_id,
        )
        return os.path.join(self.root, fname + ".json")

    def upsert(self, content_id: str, data: dict) -> dict:
        """Add or overwrite (content.go AddContent/UpdateContent)."""
        obj = {"id": content_id, "data": data}
        path = self._path(content_id)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, path)
        return obj

    def get(self, content_id: str) -> dict | None:
        path = self._path(content_id)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def list(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".json"):
                with open(os.path.join(self.root, fn)) as f:
                    out.append(json.load(f))
        return out

    def delete(self, content_id: str) -> bool:
        path = self._path(content_id)
        if os.path.exists(path):
            os.remove(path)
            return True
        return False
