"""Arrow-vectorized pandas UDFs — the sanctioned Python slow path.

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the real type hints to pick the vectorized execution mode.
Everything hot-path should be a built-in Column expression instead;
these exist for semantics built-ins can't express (and to declare the
``udf_scalar`` surface).
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def sigmoid_score(total: pd.Series) -> pd.Series:
    """Batch-vectorized sigmoid over a numeric column (Arrow transfer,
    ~10-100x faster than row-at-a-time Python UDFs)."""
    return 1.0 / (1.0 + np.exp(-(total - 150000.0) / 50000.0))
