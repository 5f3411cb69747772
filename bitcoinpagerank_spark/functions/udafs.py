"""Grouped-aggregate pandas UDAFs (SURVEY §2.10 custom-aggregate surface).

NOTE: no ``from __future__ import annotations`` here — pandas_udf reads
the REAL annotation objects to infer the UDF type; stringified
annotations (PEP 563) break the signature inspection.

Each UDAF receives a whole group's column as one numpy-backed Series via
Arrow (no per-row Python) — the template for aggregates Catalyst lacks
(harmonic/geometric means, trimmed statistics, custom sketches).
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def harmonic_mean(v: pd.Series) -> float:
    """n / Σ(1/x) — rate-style averaging (throughputs, speeds)."""
    return float(len(v) / (1.0 / v).sum())


@pandas_udf("double")
def geometric_mean(v: pd.Series) -> float:
    """exp(mean(ln x)) — multiplicative-scale averaging."""
    import numpy as np

    return float(np.exp(np.log(v.to_numpy()).mean()))
