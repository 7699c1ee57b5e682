"""SparkSession factory tuned for the local[N] sandbox but configured the
way a 1000-executor cluster run would be (AQE, Arrow, UTC, skew join)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "docling_nlp_api_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing: 256 docs/batch. Interleaved A/B at 32 cores
        # (sf0.5, same window): 256 -> 34.9k/43.9k docs/s vs 1024 ->
        # 30.6k/25.4k — larger batches only add assembly latency variance
        # because extract_arrow._bounded_slices re-cuts any batch whose
        # span total exceeds BATCH_SPAN_BUDGET anyway (memory is bounded
        # in SPANS, not docs; a batch packing several mega-docs cannot
        # blow a worker even on the raw extract() path)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # sandbox inputs are hundreds of MB: 16 MB splits keep all local[N]
        # cores busy (128 MB default would pack a 357 MB table into ~3
        # partitions). At real 100 TB scale splits are plentiful; a cluster
        # deployment overrides this back up via extra_conf/spark-submit
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.python.worker.reuse", "true")
        # surface native crashes in Python workers as task errors with a
        # traceback instead of a silently hung Arrow socket read
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    if os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb":
        # production default for the stateful streaming plane (T5/T7):
        # at 10^12-doc scale the per-key state must spill to disk, which
        # the HDFS-backed in-memory provider cannot. rocksdbjni ships
        # with Spark 4; results are provider-independent
        # (tests/test_streaming_rocksdb.py pins parity)
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def write_text_file(spark: SparkSession, path: str, content: str) -> None:
    """Write a small driver-side text file (job metrics, manifests)
    THROUGH the JVM Hadoop FileSystem, so `path` may live on any scheme
    the cluster supports (file:, hdfs:, s3a:, ...). Builtin open() only
    resolves local paths — with an object-store --output root it would
    raise AFTER the job's expensive work succeeded, failing the run on
    its very last (and cheapest) step.

    Marker semantics: content lands in a sibling temp file that is
    renamed over the destination, so a crash mid-write leaves either the
    old marker or none — never an empty/truncated one that would strand
    a fully-committed staging behind a layout-check error. On HDFS and
    local filesystems the rename step is atomic; on object stores (S3A
    renames are copy+delete) the delete→rename window can briefly expose
    a missing marker, which degrades to a restage on resume — never a
    torn marker, because the content is fully durable before the swap.
    FileSystem.rename reports failure by RETURNING FALSE rather than
    raising, so the return value is checked and raised here — a silent
    false would otherwise commit a job with no marker at all."""
    P = spark._jvm.org.apache.hadoop.fs.Path
    dst = P(path)
    tmp = P(path + "._tmp")
    fs = dst.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(dst):
        fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"write_text_file: rename {path}._tmp -> {path} failed")


def read_text_file(spark: SparkSession, path: str) -> str | None:
    """Read a small driver-side text file through the Hadoop FileSystem
    (any scheme); None if it does not exist. Counterpart of
    write_text_file for markers the pipeline must re-read on resume.

    Reads bytes via commons-io (faithful to content, trailing newlines
    included); checksum verification is disabled on a PRIVATE
    FileSystem.newInstance — never on the process-wide cached instance,
    which every executor read shares in local mode — because a marker
    legitimately rewritten by a non-Hadoop writer (plain open(), older
    runs) leaves a stale .crc sidecar that a verified read would refuse."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.newInstance(jpath.toUri(), conf)
    try:
        if not fs.exists(jpath):
            return None
        fs.setVerifyChecksum(False)  # scoped to this private instance
        stream = fs.open(jpath)
        try:
            # commons-io ships on Spark's classpath; returns a JVM string
            # (py4j copies strings faithfully, unlike byte arrays)
            return jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
    finally:
        fs.close()


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence check (any scheme) — the portable form of
    os.path.isdir for checkpoint/staging roots that may be hdfs://s3a://
    on a real cluster (os.path is always False there, which would
    silently disable exactly-once resume)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def fs_delete(spark: SparkSession, path: str) -> None:
    """Recursive Hadoop-FS delete (any scheme); no-op if absent. The
    portable shutil.rmtree(..., ignore_errors=True)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)
