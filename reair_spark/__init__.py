"""reair_spark — a PySpark-native analytics + replication engine.

Re-expresses the capabilities of airbnb/reair (metadata-driven Hive
warehouse replication, see /root/reference) as idiomatic PySpark:
catalog scans, inventory listings, diff planning, copy/commit
execution, and an incremental event-compile loop — all as DataFrame
programs — plus the declared analytics query surface (SURVEY.md §2.3)
and large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Design rules (SURVEY.md §4): reference control-flow → PySpark driver
code; reference dataflow → DataFrames; reference execution engine →
discarded (Catalyst/Tungsten/AQE replace it).
"""

__version__ = "0.1.0"

from reair_spark.session import get_spark  # noqa: F401
