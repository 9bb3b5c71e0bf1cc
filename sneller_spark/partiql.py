"""Public Sneller-dialect (PartiQL) query surface.

The reference accepts a PartiQL-flavoured SQL dialect
(/root/reference/expr/partiql/partiql.y): double-quoted identifiers,
``[...]`` / ``{'k': v}`` constructors, lateral unnest via ``FROM t,
t.path AS x``, ``DISTINCT ON``, ``UNPIVOT .. AS v AT k``, ``MISSING``,
ion timestamp literals, and a reference-named builtin surface
(TIME_BUCKET, GEO_DISTANCE, EQUALS_FUZZY, ...).  ``sneller_spark``
executes that dialect directly: :func:`translate` rewrites the dialect
deltas to Spark SQL *text* (Spark's parser does the real parsing) and
:func:`sql` runs the result on a SparkSession — the same translator
that replays the reference's own 408-case query corpus verbatim
(``sneller_spark.replay``, ``tests/replay_manifest.txt``).

Semantics note: the reference never aborts a query — failed casts and
division by zero yield MISSING.  Spark's non-ANSI NULL-on-error mode is
the exact analog, so :func:`sql` pins ``spark.sql.ansi.enabled=false``
for the returned plan's lifetime unless ``ansi="keep"`` is passed (the
conf is session-wide; pass ``ansi="keep"`` to leave it untouched).
"""

from __future__ import annotations

from . import replay
from .sql_registry import register_sql_functions

__all__ = ["translate", "sql"]


def translate(query: str) -> str:
    """Sneller/PartiQL dialect text -> equivalent Spark SQL text.

    Pure string rewrite; no SparkSession needed.  Schema-aware
    replay-exact passes (KBN float SUM, presence-shadow COUNT) are
    corpus-replay concerns and are not applied here.
    """
    return replay.translate(query)


def sql(spark, query: str, ansi: str = "false"):
    """Run a Sneller-dialect query on ``spark`` and return a DataFrame.

    Table names resolve against the session catalog (temp views,
    catalog tables) exactly as ``spark.sql`` would.  Registers the
    reference-named builtin surface (the Catalyst-inlined SQL veneer of
    ``sql_registry`` plus the replay-exact ``sn_*`` kernels) on first
    use per session.

    ansi: "false" (default) pins non-ANSI NULL-on-error evaluation —
    the reference's MISSING-on-error discipline; "keep" leaves the
    session conf untouched.
    """
    # catalog probe, not an id(spark)-keyed cache: ids recycle after a
    # stopped session is collected, which would skip registration
    if not spark.catalog.functionExists("time_bucket"):
        register_sql_functions(spark)  # ~20 DDLs; once per session
    replay.ensure_replay_udfs(spark)
    if ansi != "keep":
        spark.conf.set("spark.sql.ansi.enabled", ansi)
    return spark.sql(translate(query))
