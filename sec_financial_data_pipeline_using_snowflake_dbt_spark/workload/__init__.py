"""The engine's declared workload: every operator from SURVEY.md §2
re-expressed over the driver's test tables, each paired with an ANSI-SQL
oracle for the DuckDB correctness gate.

``QUERIES``   — name -> callable(spark, sf_dir) -> DataFrame
``ORACLES``   — name -> DuckDB SQL string (absent ⇒ rows-only check)
"""

from .registry import QUERIES, ORACLES

__all__ = ["QUERIES", "ORACLES"]
