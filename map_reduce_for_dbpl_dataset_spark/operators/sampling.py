"""Deterministic weighted sampling without replacement (one pass).

Efraimidis & Spirakis, "Weighted random sampling with a reservoir"
(IPL 2006), algorithm A-ES: give row i the key u_i^(1/w_i) with
u_i ~ U(0,1) and keep the k largest keys — the result is a weighted
sample without replacement with inclusion probabilities proportional
to the weights. Sorting by ln(u)/w is the same ordering without the
overflow-prone pow.

Determinism: u is derived from the portable md5 hash of the row id
((hash60 % 1e6 + 1) / 1000001 — never 0 or 1), not from rand(seed),
whose sequence is engine- and partitioning-dependent. The same row
set always yields the same sample, on any cluster layout, and the
DuckDB oracle reproduces it formula-for-formula.

Scale: keys are a narrow map (no shuffle); the k largest keys are a
global top-k, which Spark plans as TakeOrderedAndProject — per-task
k-row heaps merged on the driver, no global sort, no single-partition
funnel. One pass over the data, O(k) state per task: the reservoir
algorithm's distributed form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60

_U_MOD = 1_000_000
_U_DEN = 1_000_001.0


def aes_key(id_col: Column, weight_col: Column) -> Column:
    """A-ES sort key ln(u)/w (descending order = sample priority).
    weight must be > 0."""
    u = (hash60(id_col.cast("string")) % _U_MOD + 1) / F.lit(_U_DEN)
    return F.log(u) / weight_col


def weighted_sample(df: DataFrame, id_col: str, weight_col: str, k: int) -> DataFrame:
    """The k rows of df sampled with probability proportional to
    weight_col, deterministically; ties (identical keys) break on the
    id. Returns df's columns unchanged."""
    keyed = df.withColumn("_aes_k", aes_key(F.col(id_col), F.col(weight_col)))
    return (
        keyed.orderBy(F.desc("_aes_k"), F.asc(id_col)).limit(k).drop("_aes_k")
    )
