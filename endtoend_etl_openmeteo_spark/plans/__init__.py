"""Declared-query registry — the engine's public query surface.

Each operator from SURVEY.md §2 (plus the extension operators of §7 step 7)
lands here as a named query over the synthetic tables, paired with the
ANSI-SQL oracle the driver runs on DuckDB. ``load_all()`` imports every
query module so the registry is fully populated.
"""

from endtoend_etl_openmeteo_spark.plans.registry import REGISTRY, QuerySpec, register


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry."""
    from endtoend_etl_openmeteo_spark.plans import (  # noqa: F401
        advanced,
        dq,
        joins,
        multimodal,
        relational,
        similarity,
        text,
        timeseries,
        windows,
    )

    return REGISTRY


__all__ = ["REGISTRY", "QuerySpec", "register", "load_all"]
