"""docling_nlp_api_spark — PySpark-native document extraction + analytics engine.

A brand-new Spark-first reimplementation of the capabilities of
nexustech101/docling-nlp-api (reference at /root/reference, behavior only):
HTML boilerplate stripping, PDF reading-order reassembly, media-span
preservation, NLP structuring, and the analytics/metrics plane — expressed
as DataFrame ops + vectorized Arrow/pandas UDFs over span tables.
"""

__version__ = "0.1.0"
