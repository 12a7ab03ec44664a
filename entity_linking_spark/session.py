"""SparkSession factory tuned for the record-linkage workload.

Scale notes (the settings below are chosen for a 1000-executor cluster
reading ~100 TB, then scaled down for local[N] testing):

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting.
  Hot entity names (Zipfian blocking keys) are first salted explicitly in
  ``operators/blocking.py``; AQE skew-join is the second line of defense.
- ``spark.sql.shuffle.partitions`` defaults to 2× cores locally; on a real
  cluster you want ~2-3× total executor cores (set via spark-submit conf).
- Arrow is enabled for all pandas UDF traffic; batches sized so a
  128-float embedding column batch stays well under executor memory.
- Parquet scans keep default 128 MiB ``maxPartitionBytes`` — at 100 TB that
  is ~800k input splits, which is the right granularity for 1000 executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "entity-linking-spark",
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or default_parallelism()
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bigger Arrow batches halve the JVM↔Python syscall count for the
        # string-similarity UDFs; a 50k-row batch of surface strings is
        # still only a few MB.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        # 64 MB broadcast threshold: the prepared mention/entity feature
        # tables are dimension-sized at bench scale — broadcasting them
        # turns the candidate→feature attachment into map-side joins and
        # eliminates shuffling the (wide) scored-pair rows.  On a real
        # cluster the same conf lets Catalyst/AQE make the call per-stage
        # from runtime stats.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Shuffle/spill to tmpfs when it is safely large: local[N] on one box
    # is memory-bandwidth-bound during shuffle and tmpfs avoids the block
    # layer.  But tmpfs consumes RAM and fails with ENOSPC instead of
    # spilling (ADVICE r01 #4), so the default only engages when /dev/shm
    # has ≥32 GiB free; SPARK_GRAFT_LOCAL_DIR overrides explicitly (and
    # SPARK_GRAFT_LOCAL_DIR="" forces the Spark default).
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if shm is None:
        try:
            import shutil

            if shutil.disk_usage("/dev/shm").free >= 32 << 30:
                shm = "/dev/shm/spark-local"
        except OSError:
            shm = None
    if shm:
        try:
            os.makedirs(shm, exist_ok=True)
            builder = builder.config("spark.local.dir", shm)
            # Spill blocks on tmpfs live in RAM: lz4-ing them burns shared
            # CPU to save memory this box has plenty of.  Disabling SPILL
            # compression (only when the local dir is tmpfs) won every
            # interleaved A/B across three sessions (+8% to +73% probe
            # throughput, and the no-compress runs are far more stable:
            # 418-466k pairs/s vs the baseline's 182-441k swing — spill-
            # codec CPU was a variance source, not just a cost).  Small
            # jobs never spill, so this is a no-op at bench scale; disk-
            # backed local dirs (real clusters, I/O-bound spills) keep the
            # Spark default (on).
            builder = builder.config("spark.shuffle.spill.compress", "false")
        except OSError:
            pass
    # SHUFFLE-output compression stays at the default (on) everywhere:
    # turning it off on tmpfs looked like a win on one large-probe A/B
    # (+40%) but reliably LOSES 20-30% on smaller shuffles (bench fixture
    # scale) — lz4 bytes saved still matter to the shared memory bus;
    # revisit per-workload via SPARK_GRAFT_EXTRA_CONF rather than a
    # global default.
    # Smaller AQE target partitions keep post-coalesce parallelism ≥ the
    # core count on local[N]'s modest shuffle volumes (64 MiB advisory
    # coalesced the 32-core scoring stage below 32 tasks — measured ~40%
    # throughput loss).  Cluster deployments with executor-count ≫ 32
    # typically keep the 64 MiB default via this same conf.
    builder = builder.config(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "8m"),
    )
    # Experiment knob: SPARK_GRAFT_EXTRA_CONF="k1=v1;k2=v2" overlays confs
    # without code changes (used by bench/scaling probes in subprocesses).
    for item in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in item:
            k, v = item.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
