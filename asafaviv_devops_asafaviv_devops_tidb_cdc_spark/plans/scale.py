"""Cluster-sizing math: the knobs that change between local[32]/sf0.1
and a 1000-executor cluster over ~100 TB, and why.

The engine's query code never hard-codes parallelism — partition counts
flow from these formulas via SparkSession conf, so the same DataFrame
plans scale by configuration, not rewrite. The reference pipeline has
exactly one parallelism knob (Kafka partition-num=1, reference
docker-compose.yml:102) and a single-threaded consumer; here parallelism
is (input splits) x (shuffle partitions), both derived from data size.

Sizing rules implemented below:
- scan:    ~128 MiB per input split (`files.maxPartitionBytes`) — large
           enough to amortize task overhead, small enough that a split's
           decompressed columns fit executor memory.
- shuffle: partitions ~= shuffled_bytes / 200 MiB, floored at 2x total
           cores (keep every core busy), capped at 100k (scheduler
           pressure). With AQE on, this is an upper bound — runtime
           coalescing shrinks it to the advisory target per stage.
- join:    broadcast anything under ~256 MiB on a 1000-node cluster
           (dims in a star schema); beyond that, shuffle hash / sort-
           merge with AQE skew splitting.
- stream:  `maxOffsetsPerTrigger` sized so one micro-batch's rows fit
           the same 200 MiB/partition envelope across Kafka partitions.
"""

from __future__ import annotations

MIB = 1 << 20
GIB = 1 << 30
TIB = 1 << 40

TARGET_SPLIT_BYTES = 128 * MIB
TARGET_SHUFFLE_PARTITION_BYTES = 200 * MIB
MAX_SHUFFLE_PARTITIONS = 100_000
BROADCAST_THRESHOLD_BYTES = 256 * MIB


def shuffle_partitions(shuffled_bytes: int, total_cores: int) -> int:
    """Upper-bound shuffle partition count for a given shuffle volume."""
    by_size = shuffled_bytes // TARGET_SHUFFLE_PARTITION_BYTES + 1
    return int(min(max(by_size, 2 * total_cores), MAX_SHUFFLE_PARTITIONS))


def recommended_conf(
    input_bytes: int,
    executors: int = 1000,
    cores_per_executor: int = 4,
    shuffle_fraction: float = 0.5,
) -> dict[str, str]:
    """Spark conf for a batch suite over ``input_bytes`` of parquet.

    ``shuffle_fraction`` is the expected shuffled-to-scanned ratio —
    ~0.5 for this suite because the P-chain is map-only (zero shuffle)
    and the aggregation layer shuffles pre-aggregated partials only.
    At the 100 TB / 1000-executor design point this yields ~262k input
    splits and 100k (capped) shuffle partitions, both well inside
    scheduler limits.
    """
    cores = executors * cores_per_executor
    parts = shuffle_partitions(int(input_bytes * shuffle_fraction), cores)
    return {
        "spark.sql.files.maxPartitionBytes": str(TARGET_SPLIT_BYTES),
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            TARGET_SHUFFLE_PARTITION_BYTES
        ),
        "spark.sql.autoBroadcastJoinThreshold": str(BROADCAST_THRESHOLD_BYTES),
    }


def max_offsets_per_trigger(
    kafka_partitions: int, avg_event_bytes: int, total_cores: int
) -> int:
    """Micro-batch size cap: rows per trigger such that each core's
    share stays within the shuffle-partition envelope (backpressure —
    the reference has none and relies on one-message-at-a-time await,
    reference index.js:353)."""
    batch_bytes = total_cores * TARGET_SHUFFLE_PARTITION_BYTES
    return max(batch_bytes // max(avg_event_bytes, 1), kafka_partitions)
