"""Streaming user-journey transition census (X23b — the stream twin of
queries/profiling.py::q_event_transitions), with per-user HISTORY
state.

The batch census pairs CONSECUTIVE events per user ordered by
(ts, event_id). That definition is non-monotone under out-of-order
arrival: a late event lands BETWEEN two already-paired events and
rewires two pairs ((a,c) becomes (a,b)+(b,c)). A running
last-event-per-user scalar is therefore wrong; the correct state —
same argument as streaming/funnel.py — is the per-user event history,
with the user's pair multiset RECOMPUTED from the sorted history on
every update. Recomputation is O(user's own events), bounded by a
user's activity, never the stream's length; a watermark could prune
history only if the product waived late-insert rewiring.

Emission is append-mode with a per-user update counter carrying the
full recomputed pair list; the reader takes each user's LAST emission,
so the served matrix is a pure function of final state —
batch-boundary invariant, which is what lets the gate hash-match the
streamed census against the batch SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("t_us", ArrayType(LongType())),
        StructField("eid", ArrayType(LongType())),
        StructField("etype", ArrayType(StringType())),
        StructField("n_updates", IntegerType()),
    ]
)
_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_updates", IntegerType()),
        StructField("from_types", ArrayType(StringType())),
        StructField("to_types", ArrayType(StringType())),
    ]
)


def _update(key, pdfs, state):
    import pandas as pd

    if state.exists:
        t_us, eid, etype, n_updates = state.get
        t_us, eid, etype = list(t_us), list(eid), list(etype)
    else:
        t_us, eid, etype, n_updates = [], [], [], 0
    for pdf in pdfs:
        for t, i, e in zip(pdf["t_us"], pdf["event_id"], pdf["event_type"]):
            t_us.append(int(t))
            eid.append(int(i))
            etype.append(str(e))
    n_updates += 1
    state.update((t_us, eid, etype, n_updates))
    # recompute the FULL pair list from sorted history — order of
    # arrival cannot matter because arrival order is discarded here
    order = sorted(range(len(t_us)), key=lambda k: (t_us[k], eid[k]))
    seq = [etype[k] for k in order]
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_updates": [n_updates],
            "from_types": [seq[:-1]],
            "to_types": [seq[1:]],
        }
    )


def run_transitions_stream(
    spark: SparkSession, src_dir: str, schema: str, name: str
) -> DataFrame:
    """Drain ``src_dir`` through the stateful census into a memory
    sink; return the emissions frame."""
    from .ingest import STREAM_SHUFFLE_PARTITIONS, scoped_shuffle_partitions

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    keyed = stream.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("t_us"),  # micros: the batch order key
    ).groupBy("user_id")
    with scoped_shuffle_partitions(spark, STREAM_SHUFFLE_PARTITIONS):
        q = (
            keyed.applyInPandasWithState(
                _update, _OUT_SCHEMA, _STATE_SCHEMA, "append", "NoTimeout"
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def final_pair_counts(emissions: DataFrame) -> DataFrame:
    """Last emission per user -> the global (from_type, to_type, n)
    count frame — feed to queries.profiling.transition_report."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_updates"))
    last = (
        emissions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "from_types", "to_types")
    )
    pairs = last.select(
        F.explode(F.arrays_zip("from_types", "to_types")).alias("p")
    ).select(
        F.col("p.from_types").alias("from_type"),
        F.col("p.to_types").alias("to_type"),
    )
    return pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
