"""Single-node pure-Python oracle engine.

A scipy/networkx-free reimplementation of the reference semantics
(GemsLab/KGist), validated against every inlined golden in the reference's
test suite.  It is the correctness anchor for the distributed engine: the
Spark plans must produce identical candidate tables, rule sets, MDL bits and
anomaly rankings on the fixture graphs.
"""

from kgist_spark.oracle.kg import CandRecord, LocalKG
from kgist_spark.oracle.engine import GreedySearcher, ModelEvaluator, SummaryModel

__all__ = [
    "CandRecord",
    "LocalKG",
    "GreedySearcher",
    "ModelEvaluator",
    "SummaryModel",
]
