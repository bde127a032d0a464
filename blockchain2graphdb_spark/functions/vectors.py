"""Vector/embedding helpers (extension surface, SURVEY.md §2.13).

Two numeric paths:

* `quantized` — embeddings scaled to integers (round(x*1000)): dot
  products and norms become exact 64-bit integer arithmetic, so results
  are bit-identical across engines (used on the oracle-checked path).
  Quantization error ~1e-3 relative is irrelevant for ranking.
* `float_cosine` — pure higher-order-function (zip_with + aggregate)
  double cosine: the production path, fully JVM-side, no Python, no
  explode (one row per vector pair, not one per dimension).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column | str, scale: int = 1000) -> Column:
    """array<float> -> array<long> with elements round(x * scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("long"))


def float_dot(a: Column, b: Column) -> Column:
    """Exact-order left-fold dot product in double (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def float_norm(a: Column) -> Column:
    return F.sqrt(float_dot(a, a))


def float_cosine(a: Column, b: Column) -> Column:
    return float_dot(a, b) / (float_norm(a) * float_norm(b))
