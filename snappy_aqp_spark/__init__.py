"""snappy_aqp_spark — a PySpark-native approximate query processing engine.

A from-scratch rebuild of the capabilities of TIBCOSoftware/snappy-aqp
(SnappyData's AQP module) on modern PySpark: stratified sample tables with
hidden Horvitz-Thompson weights, SUM/AVG/COUNT with closed-form or bootstrap
error estimation, the ``WITH ERROR e [CONFIDENCE c] [BEHAVIOR 'b']`` SQL
surface, HAC accuracy-contract behaviors, approximate time-series TopK
sketches, and large-scale data-pipeline operators (dedup, similarity search,
text analysis).
"""

from .api import AQPSession
from .specs import ApproxAgg, ApproxQuerySpec, JoinSpec, SampleSpec
from .sampling import create_sample_table, stratified_sample
from .operators.closedform import ErrorLimitExceededException

__all__ = [
    "AQPSession", "ApproxAgg", "ApproxQuerySpec", "JoinSpec", "SampleSpec",
    "create_sample_table", "stratified_sample", "ErrorLimitExceededException",
]

__version__ = "0.1.0"
