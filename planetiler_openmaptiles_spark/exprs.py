"""Cached Column-expression builders — the plan-construction diet.

Every `pyspark.sql.functions` call is one or more py4j round trips
(~0.25 ms each on this host); a full 16-layer plan build issues ~45k of
them, so constant sub-expressions dominate driver wall time at sandbox
scale (at 100 TB the same cost exists but amortizes). A `Column` is an
immutable wrapper over an immutable Catalyst expression tree, so a
constant expression (literals, unresolved attribute refs, parsed SQL
text) can be built once per process and reused across DataFrames, plans,
and sessions in the same JVM — exactly what `functools.lru_cache` gives
us. Only builders whose output depends solely on hashable arguments may
be cached here; anything touching a specific DataFrame must not be.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F


@lru_cache(maxsize=65536)
def _lit_typed(tname: str, v) -> Column:
    return F.lit(v)


def lit(v) -> Column:
    """Cached literal (hashable scalars only). Keyed by (type, value):
    Python hashes True == 1 == 1.0 identically, but lit(True) and lit(1)
    are different Catalyst literals."""
    return _lit_typed(type(v).__name__, v)


@lru_cache(maxsize=4096)
def col(name: str) -> Column:
    return F.col(name)


@lru_cache(maxsize=4096)
def aliased(name: str, alias: str) -> Column:
    return F.col(name).alias(alias)


@lru_cache(maxsize=65536)
def _const_typed(tname: str, v, typ: str | None, alias: str | None) -> Column:
    c = F.lit(v)
    if typ:
        c = c.cast(typ)
    if alias:
        c = c.alias(alias)
    return c


def const(v, typ: str | None = None, alias: str | None = None) -> Column:
    """Cached literal with optional DDL-string cast and alias
    (type-keyed — see lit)."""
    return _const_typed(type(v).__name__, v, typ, alias)


@lru_cache(maxsize=8192)
def expr(sql: str) -> Column:
    """Cached SQL-text expression: one py4j call for a whole subtree."""
    return F.expr(sql)


def sql_quote(s: str) -> str:
    return str(s).replace("'", "''")
