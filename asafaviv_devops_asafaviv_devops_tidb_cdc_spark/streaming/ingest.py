"""Structured-Streaming ingest: the consumer loop (reference
node-consumer/index.js:339-381) as a declarative micro-batch stream.

Source contract: in production a Kafka topic
(``spark.readStream.format("kafka").option("subscribe",
"tidb-cdc-events")`` — changefeed sink at reference
docker-compose.yml:99-102); in tests a file source replaying the same
canal-json lines, run with ``Trigger.AvailableNow`` so the whole
backlog drains deterministically and the query stops.

Delivery upgrade over the reference (SURVEY §2.9): the reference is
at-least-once (autocommit 5 s + no doc id, reference
index.js:350-352,278-281 — replays duplicate). Here: checkpointed
offsets + a deterministic event key (partition, offset, rownum) +
watermarked ``dropDuplicates`` = effectively exactly-once.

Scale posture: the chain is stateless map stages except dedupe (keyed
state, bounded by the watermark) — parallelism is Kafka partitions;
``maxOffsetsPerTrigger`` bounds micro-batch size (backpressure the
reference lacks).
"""

from __future__ import annotations

import shutil
import tempfile
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import parse as P
from ..sources import envelopes_from_events, load_table

SOURCE_SCHEMA = "value string, partition int, offset long"

# Kafka topic + consumer defaults mirroring the reference deployment:
# changefeed sink topic (reference docker-compose.yml:99-102,
# partition-num=1, canal-json) and consumer loop (reference
# node-consumer/index.js:339-367: fromBeginning, eachMessage).
KAFKA_TOPIC = "tidb-cdc-events"
KAFKA_STARTING_OFFSETS = "earliest"
KAFKA_MAX_OFFSETS_PER_TRIGGER = 10_000
# per-partition fetch cap, byte-for-byte the reference consumer's
# maxBytesPerPartition (reference node-consumer/index.js:32,175)
KAFKA_MAX_PARTITION_FETCH_BYTES = 1_048_576

# the exact record schema spark-sql-kafka emits per message — the wire
# shape the golden-fixture contract tests replay without a broker
KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def kafka_source_options(
    bootstrap_servers: str,
    topic: str = KAFKA_TOPIC,
    starting_offsets: str = KAFKA_STARTING_OFFSETS,
    max_offsets_per_trigger: int = KAFKA_MAX_OFFSETS_PER_TRIGGER,
) -> dict[str, str]:
    """The ``readStream.format("kafka")`` option set (S1/S2), unit-
    testable without a broker:

    - ``startingOffsets=earliest`` == the consumer's ``fromBeginning``
      (reference index.js:346) — replay the full changefeed on first
      start; after that the CHECKPOINT owns progress (Spark ignores
      startingOffsets when a checkpoint exists — the upgrade over the
      reference's 5 s autocommit, index.js:350-352).
    - ``maxOffsetsPerTrigger`` bounds micro-batch size: backpressure
      the reference lacks.
    - ``failOnDataLoss=false``: a truncated/expired topic segment logs
      and continues, matching the consumer's never-crash posture
      (reference index.js:331, 373-380).
    - ``kafka.max.partition.fetch.bytes=1048576``: the consumer's
      1 MB ``maxBytesPerPartition`` (reference index.js:32,175),
      passed through to the underlying Kafka client.
    """
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "maxOffsetsPerTrigger": str(max_offsets_per_trigger),
        "failOnDataLoss": "false",
        "kafka.max.partition.fetch.bytes": str(
            KAFKA_MAX_PARTITION_FETCH_BYTES
        ),
    }


def kafka_envelope_projection(records: DataFrame) -> DataFrame:
    """Normalize a Kafka record batch/stream (the exact columns
    spark-sql-kafka emits — ``KAFKA_RECORD_SCHEMA``) into the
    (value, partition, offset) envelope shape the P1->P6 chain
    consumes. Shared by the live source (:func:`kafka_stream`) and the
    broker-less golden-fixture contract tests
    (tests/test_kafka_contract.py), so the projection the tests pin is
    the projection production runs. The offset goes through an
    explicit LONG cast: the Kafka source emits it as long, but the
    reference consumer's wire shape carries it as a STRING (kafkajs
    ``message.offset``, reference node-consumer/index.js:362,365), and
    a replay of kafkajs-captured records must produce byte-identical
    lineage columns."""
    return records.selectExpr(
        "CAST(value AS STRING) AS value",
        "CAST(partition AS INT) AS partition",
        "CAST(offset AS LONG) AS offset",
    )


def kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str = KAFKA_TOPIC, **kw
) -> DataFrame:
    """S1/S2 — the production source: Kafka envelope stream in the same
    (value, partition, offset) shape the file-source stand-in and the
    whole P1->P6 chain consume. Requires the spark-sql-kafka package on
    the classpath (not present in this sandbox — the option dict and
    the record projection are golden-tested instead; the file source
    replays identical bytes)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic, **kw).items():
        reader = reader.option(k, v)
    return kafka_envelope_projection(reader.load())


# ES sink parity (S3): the reference's index template — 1 shard,
# 5 s refresh, dynamic mapping with ts as date + keyword subfields
# (reference node-consumer/index.js:185-229). The parquet sink below is
# the engine-native replacement; this option set documents/configures
# the optional org.elasticsearch.spark.sql path for deployments that
# keep ES (connector jar not in this sandbox).
def es_sink_options(
    index: str, nodes: str = "localhost:9200", refresh_interval: str = "5s"
) -> dict[str, str]:
    return {
        "es.nodes": nodes,
        "es.resource": index,
        "es.mapping.id": "",  # no natural doc id in the reference (index.js:278) ->
        # ES auto-ids, at-least-once; set to "event_key" for idempotent writes
        "es.index.auto.create": "true",
        "es.batch.size.entries": "1000",
        "es.batch.write.refresh": "false",  # rely on refresh_interval
        "es.settings.index.number_of_shards": "1",
        "es.settings.index.refresh_interval": refresh_interval,
    }


def write_envelope_files(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    duplicate_fraction_mod: int | None = None,
    n_files: int = 1,
) -> str:
    """Materialize the deterministic canal-json stream as JSON-lines
    files (the test stand-in for the Kafka topic). With
    ``duplicate_fraction_mod``=m, every m-th envelope is emitted twice
    — simulating an at-least-once replay.

    ``n_files=1`` (default) is faithful to the reference's single Kafka
    partition (docker-compose.yml:102 partition-num=1 => global order);
    watermark-based consumers (the dedupe path) NEED that order — many
    unsorted files replay in arbitrary time order across micro-batches
    and the watermark would (correctly!) drop whole batches as late
    data. Order-robust consumers (the merge path, which carries full
    order keys) can take n_files>1 to exercise multi-batch behavior.
    repartition, not coalesce: coalesce would collapse the upstream
    to_json stage to one core."""
    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    raw = envelopes_from_events(load_table(spark, sf_dir, "events"))
    if duplicate_fraction_mod:
        raw = raw.unionByName(raw.filter(F.col("offset") % duplicate_fraction_mod == 0))
    raw.repartition(n_files).write.mode("overwrite").json(str(out))
    return str(out)


def envelope_files(
    spark: SparkSession,
    sf_dir: str,
    duplicate_fraction_mod: int | None = None,
    n_files: int = 1,
) -> str:
    """Shared, cached envelope landing dir: the canal-json stream is a
    pure function of (events fingerprint, dup_mod, n_files), so the
    JSONL files are materialized ONCE per that key and every stream
    consumer points its readStream at the shared path (sources read,
    never mutate it — each consumer keeps its own checkpoint/state
    dirs). Before this, every stream query re-generated + re-wrote the
    full envelope backlog as a private copy — ~6 s of pure fixed cost
    per query at sf0.1 that measured nothing about the stream under
    test. The Kafka analogy is exact: the topic is written once; each
    consumer group tracks its own offsets."""
    from ..sources.artifact import input_fingerprint, materialized_path

    fp = input_fingerprint(
        sf_dir, "events", f"env-v1-d{duplicate_fraction_mod}-f{n_files}"
    )

    def write(dest: str) -> None:
        raw = envelopes_from_events(load_table(spark, sf_dir, "events"))
        if duplicate_fraction_mod:
            raw = raw.unionByName(
                raw.filter(F.col("offset") % duplicate_fraction_mod == 0)
            )
        raw.repartition(n_files).write.mode("overwrite").json(dest)

    return materialized_path("envelopes", fp, write)


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Run a (streaming) query with ``spark.sql.shuffle.partitions=n``,
    restoring the previous value after. Stateful operators allocate one
    state store per shuffle partition and pay a per-store commit on
    every micro-batch — for the replay harness's state sizes, 32 stores
    are pure fixed overhead (measured ~2x on the availableNow streams).
    A production stream sizes this to its state volume; the checkpoint
    pins it from the first run onward either way."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


STREAM_SHUFFLE_PARTITIONS = 8


def stream_workdir(sf_dir: str, tag: str) -> Path:
    """Scratch dir for a streaming query's src/state/ckpt/sink. Prefers
    tmpfs: checkpoint/state/sink writes fsync, and on a real disk those
    stalls dominate (and destabilize) stream wall-clock; production
    points these at fast local SSD or object storage. Falls back to
    the system tempdir when /dev/shm is absent or unwritable."""
    import os as _os

    shm = Path("/dev/shm")
    base = (
        shm
        if shm.is_dir() and _os.access(shm, _os.W_OK)
        else Path(tempfile.gettempdir())
    )
    sf = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return base / "tidb_cdc_spark_stream" / f"{sf}_{tag}"


def resumable_workdir(sf_dir: str, table: str, tag: str, version: str) -> Path:
    """Workdir for a stream whose state + checkpoint are KEPT across
    invocations (the production posture: a stream drains its backlog
    once; every later trigger processes only NEW data — re-running a
    query against an already-drained checkpoint is an empty drain plus
    a state read, not a replay). Keyed by the source table's content
    fingerprint + a version string the caller bumps whenever the fold
    logic or state schema changes, so regenerated testdata or a
    rewritten maintainer can never serve stale state. The checkpoint
    itself guarantees the rest: a crashed prior drain resumes
    exactly-once (q_stream_resume pins this), and a finished one
    no-ops."""
    import os as _os

    from ..sources.artifact import input_fingerprint

    # state files are PROVIDER-SPECIFIC (an HDFS-format checkpoint
    # cannot be resumed under RocksDB or vice versa), so the posture
    # sweep (SPARK_GRAFT_STATE_PROVIDER=rocksdb) gets its own workdir
    # instead of colliding with the default provider's state
    provider = _os.environ.get("SPARK_GRAFT_STATE_PROVIDER", "").lower() or "hdfs"
    fp = input_fingerprint(sf_dir, table, version)
    return stream_workdir(sf_dir, f"{tag}_{provider[:8]}_{fp}")


def read_envelope_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", 8)  # micro-batch bound (backpressure)
        .json(source_dir)
    )


def run_ingest(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    dedupe: bool = True,
    fresh: bool = True,
) -> None:
    """Drain the backlog through P1->P5 into a parquet sink partitioned
    by destination table (partition pruning for per-table readers).
    ``fresh=False`` RESUMES from the existing checkpoint instead of
    wiping — the restart path a production consumer lives on (the
    reference's restart resumes from committed group offsets,
    index.js:350-352; here the checkpoint is the offset store)."""
    if fresh:
        for d in (sink_dir, checkpoint_dir):
            p = Path(d)
            if p.exists():
                shutil.rmtree(p)
    stream = read_envelope_stream(spark, source_dir)
    # spread the parse chain across cores — the file (or a single Kafka
    # partition) arrives as one task otherwise; raw strings are cheap to
    # shuffle, the json round-trip downstream is not cheap to serialize
    stream = stream.repartition(spark.sparkContext.defaultParallelism)
    normalized = P.normalized_events(stream)
    if dedupe:
        normalized = normalized.withWatermark("ts", "1 hour").dropDuplicates(
            ["partition", "offset", "rownum"]
        )
    # (table, date) partitioning: per-table readers prune at the scan
    # and retention/compaction work in day units — the sink design the
    # reference approximates with per-table ES indices + 5 s refresh.
    # Repartition ON the partition keys first: without it every write
    # task opens a file in every (table, date) dir — thousands of tiny
    # files and a 4x slower sink (measured); with it, one file per
    # partition dir per batch.
    normalized = normalized.withColumn("event_date", F.to_date("ts")).repartition(
        "table_name", "event_date"
    )
    with scoped_shuffle_partitions(spark, STREAM_SHUFFLE_PARTITIONS):
        q = (
            normalized.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", checkpoint_dir)
            .partitionBy("table_name", "event_date")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
