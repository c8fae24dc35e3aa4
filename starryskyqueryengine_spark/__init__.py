"""StarryskyQueryEngine-Spark: a PySpark-native rebuild of the capability
surface of ``usounds/StarryskyQueryEngine`` (reference, read-only at
/root/reference), extended with large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

The reference is a Bluesky custom-feed generator: ingest -> predicate
pipeline -> dedup upsert -> retention window -> ordered paginated top-k
serving, parameterized per feed key (see SURVEY.md). Here every stage is
re-expressed as declarative Spark DataFrame/SQL plans so Catalyst/Tungsten
pick the physical strategy; nothing is row-at-a-time Python in the hot path.
"""

__version__ = "0.1.0"
