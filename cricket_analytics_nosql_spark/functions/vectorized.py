"""Arrow-vectorized Python surface — SURVEY.md §2.12.

The reference's Python "UDFs" are driver-side row transformers; our
first preference is native expressions (Catalyst can optimize those,
it cannot see into Python). This module is the escape hatch for
logic that genuinely needs Python, demonstrating the two sanctioned
shapes:

- ``@pandas_udf`` — Arrow-batched columnar kernels (numpy under the
  hood, ~10-100× over row-at-a-time Python UDFs);
- ``@udtf`` — one row in, many rows out (Spark 4 Python UDTF), the
  shape of the reference's ``iter_deliveries`` generator
  (etl_cricsheet_to_mongo.py:70-106) when a native explode cannot
  express the expansion.

Each has a native-expression twin in the test suite asserting exact
agreement — the Python path must never silently diverge from the
JVM path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf(T.DoubleType())
def vec_l2_norm(v: pd.Series) -> pd.Series:
    """L2 norm of an array<double|float> column, one numpy reduction
    per Arrow batch."""
    return v.map(lambda a: float(np.sqrt(np.dot(a, a))))


@pandas_udf(T.LongType())
def token_count_vectorized(text: pd.Series) -> pd.Series:
    """Whitespace token count — the pandas str engine over the whole
    batch at once."""
    return text.str.split(" ").map(len).astype("int64")


@udtf(returnType="pos int, token string")
class TokenizeUDTF:
    """Row → token rows with positions (the iter_deliveries shape:
    a generator yielding many records per input). Lateral-joins via
    ``TokenizeUDTF(col)`` in SQL or the ``udtf`` API in DataFrames."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for pos, tok in enumerate(text.split(" ")):
            yield pos, tok
