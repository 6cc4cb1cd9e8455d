"""sits_classification_spark — a PySpark-native time-series rollup + downsample
+ retention engine.

A brand-new engine (NOT a port) with the temporal query semantics of
LUP-LuftbildUmweltPlanung/SITS_classification (reference at /root/reference):
equidistant compositing, cloud-gap interpolation (linear + LOCF/NOCB),
fixed-length sequence windows, and fold-based continuous aggregates cascading
raw -> 10-day -> monthly -> seasonal retention tiers over tables of
pre-tokenized sequences ``(doc_id string, tokens array<int>, n_tok int,
source string)``.

Architecture is Spark-first: DataFrame/Column expressions wherever Catalyst
can own the plan (filters, folds, window LOCF, dedup, trend); vectorized
pandas/Arrow UDFs only for the genuinely non-relational kernels (fused
gap-fill+resample, RBF smoothing, harmonic fit, Gorilla compression).
"""

from sits_classification_spark.config import EngineConfig
from sits_classification_spark.plans.engine import Engine
from sits_classification_spark.session import get_spark

__all__ = ["Engine", "EngineConfig", "get_spark"]
__version__ = "0.1.0"
