"""tool_documentsconverter_spark — a brand-new PySpark-native
main-content extraction engine with the capabilities of
EarthTan/tool-documentsConverter (reference read-only at
/root/reference), rebuilt Spark-first per SURVEY.md.

Layout:
  kernels.py    pure-Python per-format conversion semantics (shared by
                executors and the driver-side test oracle)
  schemas.py    fixed StructTypes (input_hint transcript table, results,
                lineage)
  session.py    SparkSession factory (Arrow, AQE, shuffle conf)
  functions/    pure-column (codegen) emitters + scalar surface
  operators/    extraction stage (mapInArrow), dedup, similarity,
                text-stats, xlsx->csv, multimodal plumbing
  plans/        pipeline assembly: salted repartition, stable sort,
                lineage/checkpoint, resume anti-join
  sources/      deterministic synthetic transcripts generator
  streaming/    Structured Streaming (availableNow) variant
  jobs/         spark-submit entry points
"""

__version__ = "0.1.0"
