"""nerpii_ray — a Ray-Data-native PII/NER + knowledge-graph construction engine.

From-scratch re-expression of the semantics of Clearbox-AI/nerpii
(reference at /root/reference, cited by file:line in docstrings) on
``ray.data.Dataset`` pipelines: streaming Arrow batches, actor pools for
stateful recognizer stages, grouped histogram aggregates for entity
assignment, deterministic canonicalization, and node/edge Parquet graph
materialization — plus the large-scale training-data operators
(dedup, similarity search, text stats, multimodal plumbing) a 100 TB
pipeline needs.

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

from nerpii_ray.config import EngineConfig  # noqa: F401
