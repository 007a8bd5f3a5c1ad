"""Assembled workload registry: every declared query + its oracle."""

from __future__ import annotations

from .dataprep import PREP_ORACLES, PREP_QUERIES
from .extended import EXT_ORACLES, EXT_QUERIES
from .relational import REL_ORACLES, REL_QUERIES
from .sec_star import SEC_ORACLES, SEC_QUERIES
from .streaming_q import STREAM_ORACLES, STREAM_QUERIES

QUERIES: dict[str, object] = {
    **REL_QUERIES,
    **PREP_QUERIES,
    **STREAM_QUERIES,
    **EXT_QUERIES,
    **SEC_QUERIES,
}
ORACLES: dict[str, str] = {
    **REL_ORACLES,
    **PREP_ORACLES,
    **STREAM_ORACLES,
    **EXT_ORACLES,
    **SEC_ORACLES,
}
