"""meerkat_abacus_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of fjelltopp/meerkat_abacus.

Design stance (see SURVEY.md §7): config → compiled DataFrame plan.  The
reference interprets its coding DSL / link specs / data-type fan-out row at a
time in Python (reference: meerkat_abacus/pipeline_worker/pipeline.py:63-89);
here every config artifact is compiled *at plan time* into Catalyst
expressions — CASE WHEN projections, equi-join specs, UNION ALL fan-outs — so
the hot path is pure JVM whole-stage codegen with no Python in the loop.

Layout:
  functions/   epi-week column functions, multi-format date parsing, the
               calculation-grammar → Spark SQL translator
  operators/   quality control, data-type fan-out, record linkage, the coding
               engine, initial-visit dedup, alert aggregation, locations
  datapipe/    large-scale training-data ops: dedup (exact/MinHash-LSH/
               SimHash/Jaccard/embedding), ANN similarity search, text
               analysis, multimodal column plumbing
  sources/     batch + streaming sources, deterministic fake-data generator
  sinks/       append / idempotent-upsert / dead-letter sinks
  plans/       end-to-end pipeline composition (config → one DataFrame job)
  streaming/   Structured Streaming foreachBatch wrapper reusing batch plans
"""

__version__ = "0.1.0"
