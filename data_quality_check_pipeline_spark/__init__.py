"""data_quality_check_pipeline_spark — a from-scratch PySpark-native rebuild
of the capabilities of Emmanuel-kabu/data_quality_check_pipeline
(validate / clean / mask / profile / quarantine / version / metrics),
re-targeted as a language-ID + quality-filter + PII/toxicity-scrub pipeline
over tables of audio clip + transcript pairs designed for 10^12-clip scale.

Nothing here is a port: the reference is a single-process pandas engine
(see /root/reference, e.g. src/pipeline.py) that loops row-at-a-time in
Python; this package expresses every rule as Spark Column expressions and
every score as a vectorized Arrow `pandas_udf`, and lets Catalyst/Tungsten
pick the physical plan.

Layout
------
functions/   shared Column-expression helpers (null semantics, regexes, masks)
operators/   validate / clean / scrub / profile / expectations / stats /
             dedup / similarity / text analysis
udfs/        the three vectorized scorers: langid, perplexity, audio_stats
sources/     table I/O: Iceberg when available, versioned-parquet fallback
plans/       end-to-end lazy DataFrame DAG builders + plan assertions
streaming/   Structured Streaming variant of the quality filter
control.py   threshold gate / review decisions / DLQ policy / retry
pipeline.py  batch driver orchestrating the stages
synth.py     deterministic synthetic clips corpus (seeded; planted defects)
oracle.py    pure-Python reference implementation (parity labels)
"""

__version__ = "0.1.0"
