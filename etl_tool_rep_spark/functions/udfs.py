"""Arrow-vectorized pandas UDFs — the sanctioned Python slow path.

Two constraints shape this module:
* no ``from __future__ import annotations`` — pandas_udf needs real
  (non-string) type hints to pick the vectorized execution mode;
* UDFs are constructed lazily (factories / cached wrappers), because
  ``@pandas_udf`` at module import time requires an active
  SparkSession and would make imports order-sensitive.

Everything hot-path should be a built-in Column expression instead;
these exist for kernels built-ins can't express efficiently (dense
numeric per-row compute like MinHash signatures) and to declare the
``udf_scalar`` surface.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

_cache: dict = {}


def sigmoid_score(col):
    """Batch-vectorized sigmoid over a numeric column (Arrow transfer,
    ~10-100x faster than row-at-a-time Python UDFs)."""
    if "sigmoid" not in _cache:
        @pandas_udf("double")
        def _sigmoid(total: pd.Series) -> pd.Series:
            return 1.0 / (1.0 + np.exp(-(total - 150000.0) / 50000.0))
        _cache["sigmoid"] = _sigmoid
    return _cache["sigmoid"](col)


def make_hyperplane_sig_udf(planes):
    """Vectorized random-hyperplane signature: sign bits of P @ v
    packed into one int64. Same arithmetic as the JVM fold in
    operators/knn.hyperplane_signature, at numpy speed."""
    key = ("hyperplane", len(planes), len(planes[0]))
    if key not in _cache:
        P = np.array(planes, dtype=np.float64)          # (bits, dim)
        weights = (1 << np.arange(P.shape[0], dtype=np.int64))

        @pandas_udf("long")
        def hyperplane_sig(batch: pd.Series) -> pd.Series:
            return batch.map(
                lambda v: None if v is None else int(
                    ((P @ np.asarray(v, dtype=np.float64)) > 0)
                    .astype(np.int64) @ weights))
        _cache[key] = hyperplane_sig
    return _cache[key]


def make_minhash_sig_udf(perms: list, p: int):
    """Vectorized MinHash signature kernel: ((A*h+B) mod p).min over
    the shingle axis — same int64 arithmetic as the JVM higher-order
    form (a,h < 2^31 so a*h < 2^62, no overflow), at numpy speed."""
    key = ("minhash", len(perms), p)
    if key not in _cache:
        A = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
        B = np.array([b for _, b in perms], dtype=np.int64)[:, None]

        @pandas_udf("array<long>")
        def minhash_sig(batch: pd.Series) -> pd.Series:
            # NULL-propagating like the JVM reference form (a NULL
            # shingle array must not crash the task)
            return batch.map(
                lambda h: None if h is None else
                ((A * np.asarray(h, dtype=np.int64)[None, :] + B)
                 % p).min(axis=1))
        _cache[key] = minhash_sig
    return _cache[key]
