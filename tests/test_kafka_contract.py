"""Kafka wire-contract golden tests (r8 verdict item 6).

A live broker is impossible in this sandbox, but the wire shape the
reference consumer depends on can be pinned without one: raw
Kafka-shaped records (key/value/partition/offset/timestamp — the exact
columns spark-sql-kafka emits) are replayed through the SAME projection
production uses (streaming/ingest.py::kafka_envelope_projection) and
the full P1->P5 chain, and the resulting lineage + event columns are
checked against hand-derived goldens and a pinned value hash.

Reference quirks under contract (node-consumer/index.js):
- offsets arrive as STRINGS in the kafkajs wire shape (index.js:362,
  365) while the Spark source emits longs — both must normalize to
  identical lineage columns;
- maxBytesPerPartition is 1 MB (index.js:32,175) — carried as
  kafka.max.partition.fetch.bytes in the source options;
- autoCommitInterval 5000 (index.js:351-352) means a crash replays up
  to 5 s of messages — the (partition, offset, rownum) event key must
  make that replay window idempotent.
"""

from __future__ import annotations

import hashlib

from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.operators import parse as P
from asafaviv_devops_asafaviv_devops_tidb_cdc_spark.streaming import ingest

# --- golden byte fixtures: canal-json envelopes exactly as the TiCDC
# changefeed sink writes them to the topic (reference README.MD:14,
# index.js:241-258) ------------------------------------------------------

_V_INSERT = (
    b'{"id":101,"database":"testdb","table":"events","type":"INSERT",'
    b'"es":1700000000000,"ts":1700000001000,'
    b'"data":[{"id":"1","user_id":"7","value":"3.25"},'
    b'{"id":"2","user_id":"8","value":"4.5"}]}'
)
_V_UPDATE = (
    b'{"id":102,"database":"testdb","table":"events","type":"UPDATE",'
    b'"es":1700000060000,"ts":1700000061000,'
    b'"data":[{"id":"1","user_id":"7","value":"9.75"}],'
    b'"old":[{"id":"1","user_id":"7","value":"3.25"}]}'
)
_V_DDL = (  # no data array -> invalid_format dead-letter branch
    b'{"id":103,"database":"testdb","table":"events","type":"DDL",'
    b'"es":1700000120000,"ts":1700000121000,'
    b'"sql":"ALTER TABLE events ADD COLUMN note VARCHAR(64)"}'
)
_V_JUNK = b"\x00\x01 not json at all"

# (key, value, topic, partition, offset) — two partitions, gapped
# offsets, out-of-order arrival within the batch
_RECORDS = [
    (None, _V_INSERT, "tidb-cdc-events", 0, 40),
    (None, _V_UPDATE, "tidb-cdc-events", 1, 7),
    (None, _V_DDL, "tidb-cdc-events", 0, 41),
    (None, _V_JUNK, "tidb-cdc-events", 1, 8),
]


def _kafka_batch(spark, offsets_as_strings: bool = False):
    """The records in the exact spark-sql-kafka schema; optionally with
    the kafkajs string-offset wire shape."""
    schema = ingest.KAFKA_RECORD_SCHEMA
    if offsets_as_strings:
        schema = schema.replace("offset long", "offset string")
    rows = [
        (
            k,
            v,
            t,
            p,
            str(o) if offsets_as_strings else o,
            None,
            0,
        )
        for (k, v, t, p, o) in _RECORDS
    ]
    return spark.createDataFrame(rows, schema)


def _normalized(spark, **kw):
    env = ingest.kafka_envelope_projection(_kafka_batch(spark, **kw))
    return P.normalized_events(env).orderBy("partition", "offset", "rownum")


def _value_hash(df) -> str:
    h = hashlib.sha256()
    for row in df.collect():
        h.update(repr([str(v) for v in row]).encode())
    return h.hexdigest()[:16]


def test_normalized_lineage_matches_golden(spark):
    rows = _normalized(spark).collect()
    # 2 insert rows + 1 update row survive; DDL and junk dead-letter
    assert [
        (r["partition"], r["offset"], r["rownum"], r["operation"])
        for r in rows
    ] == [(0, 40, 0, "insert"), (0, 40, 1, "insert"), (1, 7, 0, "update")]
    first = rows[0]
    assert first["database"] == "testdb"
    assert first["table_name"] == "events"
    assert first["data"]["value"] == "3.25"
    assert str(first["ts"]) == "2023-11-14 22:13:20"  # es millis, UTC
    upd = rows[2]
    assert upd["old_data"]["value"] == "3.25" and upd["data"]["value"] == "9.75"


def test_string_offsets_hash_identical_to_long_offsets(spark):
    """kafkajs delivers offsets as strings (reference index.js:362);
    a replay of that wire shape must produce byte-identical lineage."""
    long_form = _normalized(spark)
    str_form = _normalized(spark, offsets_as_strings=True)
    assert long_form.schema == str_form.schema
    assert _value_hash(long_form) == _value_hash(str_form)


def test_golden_value_hash_pinned(spark):
    """The end-to-end P1->P5 value hash over the golden bytes. If this
    moves, the wire contract moved — bump deliberately.

    Pinned-digest caveat: the digest hashes the Python repr of the
    collected rows, so it is sensitive to how a future Spark version
    reprs map-typed Row values and to the session timezone (UTC is
    pinned in session.py). A digest change on a Spark upgrade with
    unchanged row VALUES means re-pin, not wire-contract breakage —
    the value assertions in test_envelope_projection_golden are the
    semantic gate."""
    assert _value_hash(_normalized(spark)) == "b545baabd734bf44", _value_hash(
        _normalized(spark)
    )


def test_autocommit_replay_window_is_idempotent_under_event_key(spark):
    """autoCommitInterval=5000 (reference index.js:351-352) means a
    consumer crash replays up to 5 s of already-processed messages.
    The (partition, offset, rownum) event key must collapse that
    replay exactly back to the single-delivery result — the
    exactly-once upgrade the streaming dedupe stage applies."""
    once = _normalized(spark)
    env = ingest.kafka_envelope_projection(_kafka_batch(spark))
    replayed = P.normalized_events(env.unionByName(env)).dropDuplicates(
        ["partition", "offset", "rownum"]
    ).orderBy("partition", "offset", "rownum")
    assert _value_hash(once) == _value_hash(replayed)


def test_dead_letter_branches_classified(spark):
    env = ingest.kafka_envelope_projection(_kafka_batch(spark))
    statuses = {
        (r["partition"], r["offset"]): r["status"]
        for r in P.validate_envelopes(P.parse_envelopes(env)).collect()
    }
    assert statuses[(0, 40)] == P.STATUS_SUCCESS
    assert statuses[(1, 7)] == P.STATUS_SUCCESS
    assert statuses[(0, 41)] == P.STATUS_INVALID  # DDL: no data array
    assert statuses[(1, 8)] == P.STATUS_ERROR  # unparseable bytes


def test_fetch_bytes_option_matches_reference():
    opts = ingest.kafka_source_options("kafka:9092")
    assert opts["kafka.max.partition.fetch.bytes"] == "1048576"
