"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-at-scale defaults: AQE on (runtime coalescing +
skew-join splitting), Arrow transport for the pandas-UDF extraction
kernels, and a shuffle-partition count sized for the local harness
(override SPARK_GRAFT_CPUS / spark.sql.shuffle.partitions for clusters —
on a 1000-executor deployment you would set this to ~2-3× total cores
and let AQE coalesce).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip the scrapely_spark package for --py-files-style shipping.

    Executors' Python workers don't inherit the driver's sys.path; on a
    real cluster the package arrives via ``spark-submit --py-files``.
    This builds the same artifact on the fly (content-addressed, cached)
    so local sessions behave identically to cluster deployments.
    """
    import scrapely_spark

    pkg_dir = os.path.dirname(os.path.abspath(scrapely_spark.__file__))
    digest = hashlib.sha1()
    members = []
    for root, _dirs, files in os.walk(pkg_dir):
        _dirs.sort()  # deterministic traversal → stable content digest
        for fname in sorted(files):
            if fname.endswith(".py"):
                full = os.path.join(root, fname)
                members.append(full)
                with open(full, "rb") as fh:
                    digest.update(full.encode())
                    digest.update(fh.read())
    out = os.path.join(tempfile.gettempdir(),
                       "scrapely_spark-%s.zip" % digest.hexdigest()[:12])
    if not os.path.exists(out):
        tmp = out + ".tmp.%d" % os.getpid()
        with zipfile.ZipFile(tmp, "w") as zf:
            base = os.path.dirname(pkg_dir)
            for full in members:
                zf.write(full, os.path.relpath(full, base))
        os.replace(tmp, out)
    return out


def fast_local_dir() -> str | None:
    """RAM-backed scratch dir for ephemeral executor state, if present.

    Cluster nodes put ``spark.local.dir`` on local NVMe (GB/s); this
    sandbox's virtual disk measured 7 MB/s sequential write with ~10 ms
    fsync latency (BENCH/BASELINE.md round 5), which throttles every
    shuffle write and state-parquet commit behind kernel dirty-page
    writeback — an artifact of the VM, not the engine.  When a tmpfs
    with headroom exists we stage ephemeral data there instead, which
    is the faithful model of a real node.  On a managed cluster
    ``SPARK_LOCAL_DIRS`` is set by the resource manager and overrides
    ``spark.local.dir``, so this changes nothing in deployment.
    Opt out (or redirect) with ``SPARK_GRAFT_LOCAL_DIR``.
    """
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override is not None:
        if not override:
            return None  # empty string = keep Spark's default
        os.makedirs(override, exist_ok=True)
        return override
    shm = "/dev/shm"
    try:
        st = os.statvfs(shm)
        if st.f_bavail * st.f_frsize >= 32 << 30:
            # per-uid subdirectory: the previous fixed world-shared
            # path could collide with another user owning it (ADVICE
            # r5); uid (not pid) so repeated sessions of one user
            # still share scratch and old dirs don't accumulate
            path = os.path.join(
                shm, "spark-graft-local-%d" % os.getuid())
            os.makedirs(path, exist_ok=True)
            return path
    except OSError:
        pass
    return None


def get_spark(app_name: str = "scrapely-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or "local[%s]" % cpus
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # scan split size is overridable for experiments; the 128 MB
        # default measured best end-to-end here (finer splits pay more
        # per-task overhead than the extra scan parallelism returns —
        # the CPU-heavy kernels all sit behind a shuffle anyway)
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"))
        # local[N] runs N executor cores inside ONE driver JVM, so the
        # heap must be provisioned per-core like a real executor's.
        # The old 8g default gave local[32] 250 MB/core — far below any
        # production per-core provisioning — and the resulting
        # execution-memory pressure + old-gen GC throttled whatever ran
        # late in a long session (measured on the full bench: crawl
        # 2,159 → 3,744 urls/s and extract 50.3k → 104.7k pages/s at
        # 24g with identical query results; the r5 extract swings of
        # 39k–92k between identical runs trace to the same pressure).
        # 24g = 750 MB/core at local[32], still conservative next to
        # the 2–8 GB/core of real deployments; override per environment
        # with SPARK_GRAFT_DRIVER_MEM (the scaling harness pins its own
        # per-core-constant value).
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    scratch = fast_local_dir()
    if scratch:
        builder = builder.config("spark.local.dir", scratch)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ship the engine to executors exactly as spark-submit --py-files would
    spark.sparkContext.addPyFile(_package_zip())
    return spark
