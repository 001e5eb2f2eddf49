"""Operator registry: merge every module's SPECS into one dict."""

from __future__ import annotations

from data_ingestion_tool_spark.operators import (
    dedup,
    events,
    ingest,
    multimodal,
    relational,
    similarity,
    skew,
    text,
)
from data_ingestion_tool_spark.operators.base import QuerySpec, build_registry

_MODULES = [relational, events, text, dedup, similarity, multimodal, skew, ingest]


def registry() -> dict[str, QuerySpec]:
    return build_registry(*[m.SPECS for m in _MODULES])


__all__ = ["QuerySpec", "registry"]
