"""xrenner_spark: a PySpark-native knowledge-graph construction engine.

Per-document semantics reproduce the reference coreference engine
(amir-zeldes/xrenner, rule-based mode); everything around the per-document
kernel — ingest, lexicon broadcast, chain aggregation, triple emission,
dedup/similarity/text-quality operators — is Spark DataFrame dataflow.
"""

__version__ = "0.1.0"

from .lex import LexModel, load_lex, DEFAULT_MODEL_DIR  # noqa: F401
