from .ingest import binaryfile_ingest, ingest_summary  # noqa: F401
