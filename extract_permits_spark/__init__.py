"""extract-permits-spark: a PySpark-native analytics engine.

A ground-up PySpark re-expression of the query and data-processing
capabilities of the ccao-data/extract-permits reference (studied read-only;
see SURVEY.md for the full operator inventory with reference citations),
plus the large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) the 100 TB north star requires.

Design rules (SURVEY.md §7.1):
- Everything is declarative DataFrame / ``pyspark.sql.functions`` expressions
  so Catalyst + Tungsten optimize the plan (predicate pushdown, column
  pruning, whole-stage codegen). Zero row-at-a-time Python UDFs in hot paths.
- Small dimensions are broadcast; big joins shuffle on explicit keys.
- Pandas UDFs (Arrow-batched) only where built-ins genuinely cannot express
  the semantics (multimodal decode, vectorized similarity).
"""

__version__ = "0.1.0"
