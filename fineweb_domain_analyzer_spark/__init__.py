"""fineweb_domain_analyzer_spark — a PySpark-native web-corpus quality engine.

Brand-new engine with the query/data-processing capabilities of the
reference `Edwarddev0723/fineweb-domain-analyzer` (a single-file pure-
Python CLI, see /root/reference/fineweb_analyzer.py), re-expressed
Spark-first:

* declarative DataFrame plans (Catalyst handles pushdown/pruning/codegen)
* broadcast-joined domain-policy dimension instead of per-row network I/O
* Arrow-batched pandas UDFs only where exact Python semantics are
  invariant-critical (urlparse domain extraction, utf-8 decode-ignore)
* explicit skew handling (salted two-phase aggregation, AQE)
* quality-filter layer (language ID, perplexity, Gopher/C4 heuristics,
  PII/toxicity scrub), dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard), and embedding similarity search for training-data pipelines.

Designed for multi-executor clusters at 10^12-document scale; tested on
local mode.
"""

__version__ = "0.1.0"

from fineweb_domain_analyzer_spark.session import get_spark  # noqa: F401
