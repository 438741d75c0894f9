"""Pandas-UDF definitions that need REAL (non-stringified) type hints.

Most engine modules use ``from __future__ import annotations``, which
stringifies annotations and breaks ``pandas_udf``'s hint-based dispatch,
forcing the deprecated ``PandasUDFType`` functionType argument. This
module deliberately omits the future import so the supported
``Series -> float`` hint path resolves the UDF as a grouped aggregate.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_log1p_mean():
    """Mean of log1p(|v|) per group — the log-domain half of a
    geometric mean of 1+|value|; exp/round stay outside the UDF
    (JVM-side) so Python returns one scalar per group.

    Factory (not module-level UDF) so cloudpickle serializes the
    function BY VALUE: driver-contract queries must run on workers
    that cannot import reair_spark (no shipping step in the gate)."""

    @pandas_udf("double")
    def log1p_mean(v: pd.Series) -> float:
        import numpy as _np

        return float(_np.log1p(_np.abs(v.to_numpy())).mean())

    return log1p_mean
