"""Registry of data-pipeline operators (dedup, similarity, text,
multimodal) exposed through the driver contract."""

from __future__ import annotations

DATAPIPE_QUERIES: dict = {}
DATAPIPE_ORACLES: dict = {}

from reair_spark.datapipe.text import TEXT_ORACLES, TEXT_QUERIES  # noqa: E402

DATAPIPE_QUERIES.update(TEXT_QUERIES)
DATAPIPE_ORACLES.update(TEXT_ORACLES)

try:
    from reair_spark.datapipe.dedup import DEDUP_ORACLES, DEDUP_QUERIES

    DATAPIPE_QUERIES.update(DEDUP_QUERIES)
    DATAPIPE_ORACLES.update(DEDUP_ORACLES)
except ImportError:
    pass

try:
    from reair_spark.datapipe.similarity import SIM_ORACLES, SIM_QUERIES

    DATAPIPE_QUERIES.update(SIM_QUERIES)
    DATAPIPE_ORACLES.update(SIM_ORACLES)
except ImportError:
    pass

try:
    from reair_spark.datapipe.multimodal import MM_ORACLES, MM_QUERIES

    DATAPIPE_QUERIES.update(MM_QUERIES)
    DATAPIPE_ORACLES.update(MM_ORACLES)
except ImportError:
    pass

try:
    from reair_spark.datapipe.curate import CURATE_ORACLES, CURATE_QUERIES

    DATAPIPE_QUERIES.update(CURATE_QUERIES)
    DATAPIPE_ORACLES.update(CURATE_ORACLES)
except ImportError:
    pass
