"""SparkSession factory.

Replaces the reference's per-job Hadoop ``Configuration`` + ``Job`` setup
(e.g. /root/reference/src/main/java/com/mikolaj/app/PrepareDataset.java:126-170)
with a single session whose defaults are tuned for iterative graph work:
Arrow enabled for pandas UDFs, a fixed shuffle-partition count so the
iterate loop keeps a stable partitioning (the reference preserved partition
counts by counting part-files + a non-splittable input format,
RunPageRankBasic.java:365-379 / NonSplitableSequenceFileInputFormat.java:23-27;
here partitioning is an explicit property of the plan).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers (``sc.addPyFile``).

    On a real cluster this is what ``spark-submit --py-files engine.zip``
    does (the north_rule's deployment shape); in local mode it covers the
    case where the driver imported the package from a path the spawned
    Python workers don't share. Idempotent per session.
    """
    sc = spark.sparkContext
    if sc.environment.get("_bpr_shipped"):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="bpr_pyfiles"), "bitcoinpagerank_spark.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    sc.environment["_bpr_shipped"] = "1"


def get_spark(
    app_name: str = "bitcoinpagerank_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    adaptive: bool = True,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback
    ``local[*]``). AQE is on by default — the PageRank loop pins its own
    partitioning per-stage and disables AQE coalescing locally where a
    stable layout matters (SURVEY.md §4.2 R3).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true" if adaptive else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true" if adaptive else "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16g, deliberately NOT larger: on a single local JVM a huge heap
        # plus many task threads collapses into GC thrash (measured 6×
        # slower at local[32] with 64g vs 16g); executors on a real
        # cluster size their own heaps per-node
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    # Shuffle/spill files on RAM-backed storage when available: iterative
    # graph work writes ~|E|-scale shuffle data per iteration, and on this
    # box /tmp is a spinning-rust-class virtual disk while /dev/shm is
    # tmpfs. On a real cluster the analog is node-local NVMe (or ramdisk)
    # shuffle dirs — standard practice, set per-node.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        # tmpfs is typically capped at 50% of RAM: only take it when there
        # is real headroom, otherwise big shuffles would hit ENOSPC where
        # plain disk would have worked
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 8 << 30:
                local_dir = "/dev/shm/bpr-spark-local"
        except OSError:
            pass
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # e.g. -XX:ParallelGCThreads=N when the JVM is taskset-pinned to fewer
    # cpus than the machine reports (the JVM sizes GC threads from the
    # MACHINE's cpu count, oversubscribing the pinned set during GC)
    extra_java = os.environ.get("SPARK_GRAFT_EXTRA_JAVA")
    if extra_java:
        builder = builder.config("spark.driver.extraJavaOptions", extra_java)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark
