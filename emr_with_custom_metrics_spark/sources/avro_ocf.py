"""Avro Object Container File (OCF) writer + reader — stdlib only.

Avro is the wire format of Kafka-centric data engineering; a corpus
pipeline meets .avro drops right beside parquet and JSONL. Spark's
spark-avro module is an EXTERNAL package not deployed in this
environment (and no Python avro/fastavro either), so the format tier
implements the container honestly from the specification:

* **Container** (Avro 1.11 spec, "Object Container Files"): magic
  ``Obj\\x01``; file-metadata map (block-count-prefixed key/value
  pairs, zero-count terminated) carrying ``avro.schema`` (JSON) and
  ``avro.codec``; a random-free deterministic 16-byte sync marker
  (md5 of the schema — any deterministic value is legal, the marker
  only needs to match between header and blocks); data blocks as
  (record-count, byte-size, payload, sync) with the sync marker
  VERIFIED on every block.
* **Binary encoding**: zigzag varint longs/ints, length-prefixed UTF-8
  strings and bytes, IEEE-754 little-endian doubles, 1-byte booleans,
  union [null, T] with a zigzag branch index — the subset a flat
  record schema needs. Fields are encoded strictly in schema order.
* **Codecs**: ``null`` and ``deflate`` (raw DEFLATE, wbits=-15, per
  spec) — both exercised by the registered query (alternating blocks
  is not legal — codec is per-file — so the query writes one file of
  each).

Error surface: corrupt structure (bad magic, sync mismatch, varint
overrun, short block) raises ValueError; foreign features (other
codecs, non-record schemas, unsupported field types) raise
NotImplementedError → the honest-scope contract shared by the archive
tier. No independent Python implementation exists in this container,
so cross-validation is: byte-level golden structure tests + the
registered query's closed-form oracle over recovered values + the
Spark-JVM reader when spark-avro is present (env-gated test).

Reference parity note: the reference (tmusabbir/emr-with-custom-metrics)
reads TSV only (scripts/spark_converter.py:25); formats breadth is §2B
engine surface.
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib

_MAGIC = b"Obj\x01"


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(data):
            raise ValueError("varint overruns the buffer")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint longer than 64 bits")
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_value(v, typ: str) -> bytes:
    if isinstance(typ, list):  # union [null, T]
        if v is None:
            return _zigzag_encode(0)
        return _zigzag_encode(1) + _encode_value(v, typ[1])
    if typ == "long" or typ == "int":
        return _zigzag_encode(int(v))
    if typ == "string":
        raw = str(v).encode()
        return _zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        return _zigzag_encode(len(v)) + bytes(v)
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    raise NotImplementedError(f"Avro type {typ!r} unsupported")


def _decode_value(data: bytes, pos: int, typ: str):
    if isinstance(typ, list):
        branch, pos = _zigzag_decode(data, pos)
        if branch == 0:
            return None, pos
        if branch != 1:
            raise ValueError(f"union branch {branch} out of range")
        return _decode_value(data, pos, typ[1])
    if typ in ("long", "int"):
        return _zigzag_decode(data, pos)
    if typ == "string":
        n, pos = _zigzag_decode(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError("string length overruns the block")
        try:
            return data[pos : pos + n].decode(), pos + n
        except UnicodeDecodeError as exc:
            raise ValueError(f"invalid UTF-8 in string: {exc}") from None
    if typ == "bytes":
        n, pos = _zigzag_decode(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError("bytes length overruns the block")
        return bytes(data[pos : pos + n]), pos + n
    if typ == "double":
        if pos + 8 > len(data):
            raise ValueError("double overruns the block")
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if typ == "boolean":
        if pos >= len(data):
            raise ValueError("boolean overruns the block")
        if data[pos] not in (0, 1):
            raise ValueError("boolean byte out of range")
        return bool(data[pos]), pos + 1
    raise NotImplementedError(f"Avro type {typ!r} unsupported")


def write_avro(
    schema: dict, records: list[dict], codec: str = "null",
    records_per_block: int = 100,
) -> bytes:
    """Serialize records under a flat record schema into one OCF."""
    if schema.get("type") != "record":
        raise NotImplementedError("only record schemas supported")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"codec {codec!r} unsupported")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    schema_json = json.dumps(schema, separators=(",", ":")).encode()
    sync = hashlib.md5(schema_json).digest()  # deterministic 16-byte marker

    out = bytearray(_MAGIC)
    meta = [(b"avro.schema", schema_json), (b"avro.codec", codec.encode())]
    out += _zigzag_encode(len(meta))
    for k, v in meta:
        out += _zigzag_encode(len(k)) + k
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    out += sync

    for i in range(0, len(records), records_per_block):
        chunk = records[i : i + records_per_block]
        payload = bytearray()
        for rec in chunk:
            for name, typ in fields:
                payload += _encode_value(rec[name], typ)
        body = bytes(payload)
        if codec == "deflate":
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = comp.compress(body) + comp.flush()
        out += _zigzag_encode(len(chunk))
        out += _zigzag_encode(len(body))
        out += body
        out += sync
    return bytes(out)


def read_avro(payload: bytes) -> dict:
    """Parse an OCF; returns {schema, codec, n_blocks, records}."""
    if payload[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _zigzag_decode(payload, pos)
        if count == 0:
            break
        if count < 0:
            # negative block count carries a size; not emitted by us but
            # legal — read and discard the size
            count = -count
            _, pos = _zigzag_decode(payload, pos)
        for _ in range(count):
            kl, pos = _zigzag_decode(payload, pos)
            if kl < 0 or pos + kl > len(payload):
                raise ValueError("metadata key overruns the file")
            try:
                k = payload[pos : pos + kl].decode()
            except UnicodeDecodeError as exc:
                raise ValueError(f"invalid UTF-8 metadata key: {exc}") from None
            pos += kl
            vl, pos = _zigzag_decode(payload, pos)
            if vl < 0 or pos + vl > len(payload):
                raise ValueError("metadata value overruns the file")
            meta[k] = payload[pos : pos + vl]
            pos += vl
    if "avro.schema" not in meta:
        raise ValueError("missing avro.schema metadata")
    try:
        schema = json.loads(meta["avro.schema"])
    except json.JSONDecodeError as exc:
        raise ValueError(f"bad schema JSON: {exc}") from None
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise NotImplementedError("only record schemas supported")
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"codec {codec!r} unsupported")
    raw_fields = schema.get("fields")
    if not isinstance(raw_fields, list):
        raise ValueError("schema has no fields array")
    fields = []
    for f in raw_fields:
        if not isinstance(f, dict) or "name" not in f or "type" not in f:
            raise ValueError("malformed schema field entry")
        fields.append((f["name"], f["type"]))
    if pos + 16 > len(payload):
        raise ValueError("truncated before the sync marker")
    sync = payload[pos : pos + 16]
    pos += 16

    records: list[dict] = []
    n_blocks = 0
    while pos < len(payload):
        count, pos = _zigzag_decode(payload, pos)
        size, pos = _zigzag_decode(payload, pos)
        if count < 0 or size < 0 or pos + size + 16 > len(payload):
            raise ValueError("block overruns the file")
        body = payload[pos : pos + size]
        pos += size
        if payload[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch after block")
        pos += 16
        if codec == "deflate":
            try:
                dec = zlib.decompressobj(-15)
                body = dec.decompress(body) + dec.flush()
            except zlib.error as exc:
                raise ValueError(f"bad deflate block: {exc}") from None
        bp = 0
        for _ in range(count):
            rec = {}
            for name, typ in fields:
                rec[name], bp = _decode_value(body, bp, typ)
            records.append(rec)
        if bp != len(body):
            raise ValueError("block payload has trailing bytes")
        n_blocks += 1
    return {
        "schema": schema,
        "codec": codec,
        "n_blocks": n_blocks,
        "records": records,
    }


# ---------------------------------------------------------------------------
# Registered query
# ---------------------------------------------------------------------------
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from emr_with_custom_metrics_spark.catalog import load_table  # noqa: E402
from emr_with_custom_metrics_spark.registry import register  # noqa: E402

_ORDER_SCHEMA = {
    "type": "record",
    "name": "OrderLine",
    "fields": [
        {"name": "o_orderkey", "type": "long"},
        {"name": "o_totalprice", "type": "double"},
        {"name": "o_orderstatus", "type": ["null", "string"]},
    ],
}


def _avro_group(pdf: "pd.DataFrame") -> "pd.DataFrame":  # noqa: F821
    import pandas as pd

    pdf = pdf.sort_values("o_orderkey")
    # codec per group: priorities ending in an odd digit take deflate —
    # both codec paths run corpus-wide (codec is per-FILE in OCF)
    prio = pdf["o_orderpriority"].iloc[0]
    codec = "deflate" if int(prio[0]) % 2 == 1 else "null"
    recs = [
        {
            "o_orderkey": int(k),
            "o_totalprice": float(p),
            "o_orderstatus": None if int(k) % 3 == 0 else str(c),
        }
        for k, p, c in zip(
            pdf["o_orderkey"], pdf["o_totalprice"], pdf["o_orderstatus"]
        )
    ]
    got = read_avro(write_avro(_ORDER_SCHEMA, recs, codec=codec))
    assert got["records"] == recs  # byte-for-byte round trip inside the task
    n_null = sum(1 for r in got["records"] if r["o_orderstatus"] is None)
    total = round(sum(r["o_totalprice"] for r in got["records"]), 2)
    return pd.DataFrame(
        {
            "o_orderpriority": [prio],
            "codec": [codec],
            "n_records": [len(got["records"])],
            "n_blocks": [got["n_blocks"]],
            "n_null_status": [n_null],
            "sum_price": [total],
        }
    )


@register(
    "formats_avro_roundtrip",
    # Closed-form oracle straight from orders: block count follows the
    # 100-records/block layout, null-union branching follows the k%3
    # rule, and the price sum pins the double codec. Any varint, union-
    # branch, block-framing, sync, or deflate slip changes a column.
    oracle="""
    SELECT o_orderpriority,
           CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS INT) % 2 = 1
                THEN 'deflate' ELSE 'null' END AS codec,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(CEIL(COUNT(*) / 100.0) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_status,
           (CAST(ROUND((SUM(o_totalprice)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS sum_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Avro Object Container File round-trip (sources/avro_ocf.py — "
    "from scratch: spark-avro is an undeployed external module and no "
    "Python avro lib exists here): each priority group's orders "
    "serialize through the real OCF layout — zigzag varints, "
    "[null,string] unions, 100-record blocks, verified sync markers, "
    "null AND deflate codecs split across groups — and back. The "
    "in-task assert pins record-exact recovery; the oracle pins "
    "count/blocks/union-branch/price columns. One shuffle by priority; "
    "at scale each task handles its own shard file, the natural Avro "
    "ingestion shape.",
)
def formats_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    return d.groupBy("o_orderpriority").applyInPandas(
        _avro_group,
        schema=(
            "o_orderpriority string, codec string, n_records bigint, "
            "n_blocks bigint, n_null_status bigint, sum_price double"
        ),
    )
