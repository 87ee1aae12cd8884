"""Named query registry.

Aggregates every query family into the flat dicts that
``__spark_entry__.queries()`` / ``oracle_sql()`` expose to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import dblp


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(dblp.QUERIES)
    try:
        from . import tpch

        out.update(tpch.QUERIES)
    except ImportError:
        pass
    try:
        from . import llm

        out.update(llm.QUERIES)
    except ImportError:
        pass
    try:
        from . import pipeline

        out.update(pipeline.QUERIES)
    except ImportError:
        pass
    try:
        from . import streaming_queries

        out.update(streaming_queries.QUERIES)
    except ImportError:
        pass
    try:
        from . import sinks_queries

        out.update(sinks_queries.QUERIES)
    except ImportError:
        pass
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(dblp.ORACLE_SQL)
    try:
        from . import tpch

        out.update(tpch.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from . import llm

        out.update(llm.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from . import pipeline

        out.update(pipeline.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from . import streaming_queries

        out.update(streaming_queries.ORACLE_SQL)
    except ImportError:
        pass
    try:
        from . import sinks_queries

        out.update(sinks_queries.ORACLE_SQL)
    except ImportError:
        pass
    return out
