"""Namespace / CURIE management.

Reference: internal/server/store.go:213-326 (NamespaceManager —
GetNamespacePrefix, AssertPrefixMappingForExpansion, ExpandCurie).

The prefix↔expansion map is tiny (dozens of rows at most), so it lives
driver-side and is applied as literal column expressions / broadcast
map lookups — never a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default namespace registry used by the TPC-H ingest (datahub_spark.ingest).
DEFAULT_NAMESPACES: dict[str, str] = {
    "p": "http://example.io/schema/",
    "cust": "http://example.io/customer/",
    "nat": "http://example.io/nation/",
    "reg": "http://example.io/region/",
    "sup": "http://example.io/supplier/",
    "part": "http://example.io/part/",
    "ord": "http://example.io/order/",
    "li": "http://example.io/lineitem/",
    "user": "http://example.io/user/",
    "doc": "http://example.io/document/",
    "vec": "http://example.io/embedding/",
}


class NamespaceManager:
    """Driver-side prefix registry mirroring the reference's semantics."""

    def __init__(self, namespaces: dict[str, str] | None = None):
        self._prefix_to_expansion = dict(namespaces or DEFAULT_NAMESPACES)

    def assert_prefix(self, expansion: str) -> str:
        """AssertPrefixMappingForExpansion (store.go:289): get-or-create."""
        for prefix, exp in self._prefix_to_expansion.items():
            if exp == expansion:
                return prefix
        prefix = f"ns{len(self._prefix_to_expansion)}"
        self._prefix_to_expansion[prefix] = expansion
        return prefix

    def get_prefix(self, expansion: str) -> str:
        """GetPrefixMappingForExpansion (store.go:272); raises if absent."""
        for prefix, exp in self._prefix_to_expansion.items():
            if exp == expansion:
                return prefix
        raise KeyError(expansion)

    def expand_curie(self, curie: str) -> str:
        """ExpandCurie (store.go:256)."""
        prefix, _, local = curie.partition(":")
        return self._prefix_to_expansion[prefix] + local

    def compress_uri(self, uri: str) -> str:
        """GetNamespacedIdentifierFromURI (store.go:346)."""
        best = ""
        best_prefix = None
        for prefix, exp in self._prefix_to_expansion.items():
            if uri.startswith(exp) and len(exp) > len(best):
                best, best_prefix = exp, prefix
        if best_prefix is None:
            raise KeyError(uri)
        return f"{best_prefix}:{uri[len(best):]}"

    def context(self) -> dict[str, str]:
        """The ``@context`` namespaces object (GetGlobalContext, store.go:426)."""
        return dict(self._prefix_to_expansion)

    # ---- column-level (distributed) variants -------------------------------

    def expand_col(self, col: Column) -> Column:
        """Expand a CURIE column to full URIs via a literal map lookup
        (no shuffle; constant-folded by Catalyst)."""
        pairs: list[Column] = []
        for prefix, exp in self._prefix_to_expansion.items():
            pairs.append(F.lit(prefix))
            pairs.append(F.lit(exp))
        mapping = F.create_map(*pairs)
        prefix = F.substring_index(col, ":", 1)
        # substring_index(col, ':', -1) would break ids whose local part
        # contains ':' — ingest-controlled CURIEs never do, so this stays in
        # whole-stage codegen with no UDF.
        local = F.substring_index(col, ":", -1)
        return F.concat(F.coalesce(mapping[prefix], F.lit("")), local)

    def compress_col(self, col: Column) -> Column:
        """Compress full-URI column to CURIEs; longest-expansion-first,
        expressed as a chain of startswith CASE arms (constant-folded)."""
        expr: Column | None = None
        for prefix, exp in sorted(self._prefix_to_expansion.items(), key=lambda kv: -len(kv[1])):
            arm = F.concat(F.lit(prefix + ":"), F.substring(col, len(exp) + 1, 1 << 20))
            cond = col.startswith(exp)
            expr = F.when(cond, arm) if expr is None else expr.when(cond, arm)
        assert expr is not None
        return expr.otherwise(col)
