"""TheWhisperDB-Spark: a PySpark-native analytics engine with the query and
data-processing capabilities of the reference knowledge-graph database
(innoky/TheWhisperDB), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession builders tuned for local testing / cluster scale
- ``catalog``    : testdata table loaders + the engine's state tables
- ``schemas``    : declared StructTypes + lenient-ingest normalization
- ``operators/`` : pure DataFrame -> DataFrame operator library (SURVEY §2)
- ``crud``       : snapshot-transform mutations (M1-M6)
- ``pipelines``  : composite jobs (clustering, relink, embed-missing)
- ``streaming/`` : Structured Streaming jobs over the events stream

Everything here is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
