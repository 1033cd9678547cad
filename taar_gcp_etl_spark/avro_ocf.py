"""Minimal Avro Object Container File codec — the S7/S8 fallback when the
spark-avro connector is absent from the classpath (this image ships only the
Avro core Java jars; the connector's Maven coordinate is
``org.apache.spark:spark-avro_2.13:<spark-version>`` and io.write_avro /
io.read_avro prefer ``format("avro")`` whenever the probe finds it).

Implemented from the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/): OCF magic ``Obj\\x01``,
file-metadata map (``avro.schema``, ``avro.codec``), 16-byte sync marker,
data blocks of (row count, byte size, deflate-or-null payload, sync). Binary
encoding: zigzag-varint longs, length-prefixed UTF-8 strings/bytes,
little-endian IEEE doubles/floats, union index prefix for nullable fields,
``timestamp-micros`` logical type for timestamps.

Scope: FLAT record schemas over the types the reference's export surface
uses (taar_etl/taar_profile_bigtable.py:112-132 — BigQuery Avro exports are
key/payload-shaped) plus the fixture scalar types. Interop is tested against
the real Avro Java library via the JVM already in the Spark session
(tests/test_io_surface.py: python-written files read back with
org.apache.avro.file.DataFileReader).

Reference: taar_etl/taar_profile_bigtable.py:112-132,181-184 (S7/S8).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import io
import json
import struct
import zlib
from typing import Any

from pyspark.sql import types as T

MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    T.StringType(): "string",
    T.LongType(): "long",
    T.IntegerType(): "int",
    T.DoubleType(): "double",
    T.FloatType(): "float",
    T.BooleanType(): "boolean",
    T.BinaryType(): "bytes",
}


def avro_schema_for(schema: T.StructType, name: str = "spark_export") -> dict:
    """Spark StructType → flat Avro record schema. Nullable fields become
    the standard ``["null", T]`` union; timestamps map to the
    timestamp-micros logical type (what BigQuery's Avro export uses)."""
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            typ: Any = {"type": "long", "logicalType": "timestamp-micros"}
        elif f.dataType in _SPARK_TO_AVRO:
            typ = _SPARK_TO_AVRO[f.dataType]
        else:
            raise TypeError(
                f"avro fallback supports flat scalar schemas; field "
                f"{f.name!r} has unsupported type {f.dataType}"
            )
        if f.nullable:
            typ = ["null", typ]
        fields.append({"name": f.name, "type": typ})
    return {"type": "record", "name": name, "fields": fields}


def spark_schema_for(avro_schema: dict) -> T.StructType:
    """Avro record schema → Spark StructType (inverse of avro_schema_for)."""
    back = {
        "string": T.StringType(),
        "long": T.LongType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "bytes": T.BinaryType(),
    }
    fields = []
    for f in avro_schema["fields"]:
        typ = f["type"]
        nullable = False
        if isinstance(typ, list):  # ["null", T] union
            nullable = True
            typ = next(t for t in typ if t != "null")
        if isinstance(typ, dict):
            if typ.get("logicalType") == "timestamp-micros":
                spark_t: T.DataType = T.TimestampType()
            else:
                spark_t = back[typ["type"]]
        else:
            spark_t = back[typ]
        fields.append(T.StructField(f["name"], spark_t, nullable))
    return T.StructType(fields)


# --- primitive encoders (Avro spec §binary encoding) -----------------------


def _zigzag(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _enc_value(v: Any, typ: Any, out: bytearray) -> None:
    if isinstance(typ, list):  # nullable union, ["null", T]
        if v is None:
            out += _zigzag(typ.index("null"))
            return
        idx = next(i for i, t in enumerate(typ) if t != "null")
        out += _zigzag(idx)
        _enc_value(v, typ[idx], out)
        return
    if isinstance(typ, dict):
        if typ.get("logicalType") == "timestamp-micros":
            if isinstance(v, dt.datetime):
                epoch = dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
                # integer timedelta arithmetic — total_seconds() is a float
                # and rounds microseconds for dates past ~2240
                d = v - epoch
                v = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
            out += _zigzag(int(v))
            return
        typ = typ["type"]
    if typ in ("long", "int"):
        out += _zigzag(int(v))
    elif typ == "string":
        raw = str(v).encode("utf-8")
        out += _zigzag(len(raw)) + raw
    elif typ == "bytes":
        raw = bytes(v)
        out += _zigzag(len(raw)) + raw
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "float":
        out += struct.pack("<f", float(v))
    elif typ == "boolean":
        out.append(1 if v else 0)
    elif typ == "null":
        pass
    else:
        raise TypeError(f"unsupported avro type {typ!r}")


def _dec_value(buf: io.BytesIO, typ: Any) -> Any:
    if isinstance(typ, list):
        idx = _read_zigzag(buf)
        return _dec_value(buf, typ[idx])
    if isinstance(typ, dict):
        if typ.get("logicalType") == "timestamp-micros":
            us = _read_zigzag(buf)
            return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)
        typ = typ["type"]
    if typ in ("long", "int"):
        return _read_zigzag(buf)
    if typ == "string":
        n = _read_zigzag(buf)
        return buf.read(n).decode("utf-8")
    if typ == "bytes":
        n = _read_zigzag(buf)
        return buf.read(n)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "boolean":
        return buf.read(1)[0] == 1
    if typ == "null":
        return None
    raise TypeError(f"unsupported avro type {typ!r}")


# --- container file --------------------------------------------------------


def encode_ocf(
    rows: list[dict],
    avro_schema: dict,
    codec: str = "deflate",
    sync_seed: bytes = b"taar_gcp_etl_spark",
) -> bytes:
    """Serialize rows (dicts keyed by field name) to one OCF file. The sync
    marker is derived deterministically from the seed so identical inputs
    produce identical files (reproducible partitions)."""
    sync = hashlib.md5(sync_seed).digest()
    schema_json = json.dumps(avro_schema)
    out = bytearray(MAGIC)
    # file metadata map: one block of 2 entries, then end-of-map
    meta = [
        ("avro.schema", schema_json.encode("utf-8")),
        ("avro.codec", codec.encode("utf-8")),
    ]
    out += _zigzag(len(meta))
    for k, v in meta:
        kb = k.encode("utf-8")
        out += _zigzag(len(kb)) + kb + _zigzag(len(v)) + v
    out += _zigzag(0)
    out += sync
    if rows:
        body = bytearray()
        ftypes = [(f["name"], f["type"]) for f in avro_schema["fields"]]
        for row in rows:
            for name, typ in ftypes:
                _enc_value(row.get(name), typ, body)
        payload = bytes(body)
        if codec == "deflate":  # raw deflate per spec (no zlib wrapper)
            c = zlib.compressobj(wbits=-15)
            payload = c.compress(bytes(body)) + c.flush()
        out += _zigzag(len(rows)) + _zigzag(len(payload)) + payload + sync
    return bytes(out)


def _read_ocf_meta(buf: io.BytesIO) -> tuple[dict, str, bytes]:
    """Parse the OCF magic + file-metadata map; returns
    (avro schema, codec, sync marker) with `buf` positioned at the first
    data block. Only the header bytes are consumed — schema sniffing does
    not require decoding any rows."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_zigzag(buf)
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte size
            _read_zigzag(buf)
            n = -n
        for _ in range(n):
            klen = _read_zigzag(buf)
            k = buf.read(klen).decode("utf-8")
            vlen = _read_zigzag(buf)
            meta[k] = buf.read(vlen)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync


def decode_ocf_header(content: bytes) -> dict:
    """Schema from an OCF prefix (header only — no row decode, no need for
    the full file: any prefix that covers the metadata map suffices)."""
    schema, _, _ = _read_ocf_meta(io.BytesIO(content))
    return schema


def decode_ocf(content: bytes) -> tuple[dict, list[dict]]:
    """Parse one OCF file → (avro schema, rows as dicts)."""
    buf = io.BytesIO(content)
    schema, codec, sync = _read_ocf_meta(buf)
    ftypes = [(f["name"], f["type"]) for f in schema["fields"]]
    rows: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_zigzag(buf)
        size = _read_zigzag(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            rows.append({name: _dec_value(bbuf, typ) for name, typ in ftypes})
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch — corrupt avro block")
    return schema, rows
