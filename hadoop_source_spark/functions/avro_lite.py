"""Minimal pure-Python Avro Object Container File codec.

Reference behavior: ``hadoop fs -text`` sniffs Avro data files by their
magic bytes and dumps each datum as a JSON line
(common/fs/shell/Display.java:124-164, AvroFileInputStream:258). Spark's
avro SQL datasource is an external module not present in this
environment, so the ``-text`` parity path decodes the container format
directly: the Avro spec's core binary encoding (zigzag varints, length-
prefixed bytes/strings, block-structured arrays/maps) over the standard
schema subset — null/boolean/int/long/float/double/bytes/string, record,
enum, array, map, union, fixed — with null and deflate codecs.

Scale shape: one container file decodes as a stream in one task;
``hadoop_source_spark.io.read_avro_text`` fans files out across the
cluster via the binaryFile source + mapInPandas, which is exactly how
the shell command parallelizes (one stream per file).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator
from typing import Any

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- decoding

def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro spec 'Primitive Types: int and long')."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _decode(schema: Any, buf: io.BytesIO) -> Any:
    if isinstance(schema, list):  # union: long branch index, then branch
        return _decode(schema[_read_long(buf)], buf)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode(f["type"], buf) for f in schema["fields"]
            }
        if t == "enum":
            return schema["symbols"][_read_long(buf)]
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (skippable form)
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    out.append(_decode(schema["items"], buf))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf)
        if t == "fixed":
            return buf.read(schema["size"])
        return _decode(t, buf)  # e.g. {"type": "string"}
    # primitive name
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported Avro schema: {schema!r}")


def decode_container(data: bytes) -> Iterator[Any]:
    """Yield every datum in an Avro Object Container File."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    while True:
        head = buf.read(1)
        if not head:
            return
        buf.seek(-1, 1)
        count = _read_long(buf)
        block = _read_bytes(buf)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec: {codec}")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            yield _decode(schema, bbuf)
        if buf.read(16) != sync:
            raise ValueError("Avro sync marker mismatch")


def _json_safe(v: Any) -> Any:
    if isinstance(v, bytes):
        return v.decode("latin-1")
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_json_safe(x) for x in v]
    return v


def records_to_json(data: bytes) -> list[str]:
    """The -text rendering: one compact JSON line per datum."""
    return [
        json.dumps(_json_safe(r), separators=(",", ":"), sort_keys=True)
        for r in decode_container(data)
    ]


# ---------------------------------------------------------------- encoding
# (writer side: lets tests build real container files, and gives the
# engine a sink the reference's avro readers can consume)

def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


def _encode(schema: Any, v: Any, out: io.BytesIO) -> None:
    if isinstance(schema, list):  # union: pick first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, v):
                _write_long(out, i)
                _encode(branch, v, out)
                return
        raise ValueError(f"value {v!r} matches no union branch {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], v[f["name"]], out)
            return
        if t == "enum":
            _write_long(out, schema["symbols"].index(v))
            return
        if t == "array":
            if v:
                _write_long(out, len(v))
                for item in v:
                    _encode(schema["items"], item, out)
            _write_long(out, 0)
            return
        if t == "map":
            if v:
                _write_long(out, len(v))
                for k, item in v.items():
                    _write_bytes(out, k.encode("utf-8"))
                    _encode(schema["values"], item, out)
            _write_long(out, 0)
            return
        if t == "fixed":
            out.write(v)
            return
        _encode(t, v, out)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.write(b"\x01" if v else b"\x00")
        return
    if schema in ("int", "long"):
        _write_long(out, v)
        return
    if schema == "float":
        out.write(struct.pack("<f", v))
        return
    if schema == "double":
        out.write(struct.pack("<d", v))
        return
    if schema == "bytes":
        _write_bytes(out, v)
        return
    if schema == "string":
        _write_bytes(out, v.encode("utf-8"))
        return
    raise ValueError(f"unsupported Avro schema: {schema!r}")


def _matches(schema: Any, v: Any) -> bool:
    name = schema if isinstance(schema, str) else schema.get("type")
    if name == "null":
        return v is None
    if name == "boolean":
        return isinstance(v, bool)
    if name in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if name in ("float", "double"):
        return isinstance(v, float)
    if name in ("bytes", "fixed"):
        return isinstance(v, bytes)
    if name in ("string", "enum"):
        return isinstance(v, str)
    if name == "record":
        return isinstance(v, dict)
    if name == "map":
        return isinstance(v, dict)
    if name == "array":
        return isinstance(v, list)
    return v is not None


def encode_container(
    schema: Any, records: list[Any], codec: str = "null",
    sync: bytes = b"\x00" * 16,
) -> bytes:
    """Build an Avro Object Container File (one block)."""
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    body = io.BytesIO()
    for r in records:
        _encode(schema, r, body)
    block = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        block = comp.compress(block) + comp.flush()
    elif codec != "null":
        raise ValueError(f"unsupported Avro codec: {codec}")
    _write_long(out, len(records))
    _write_bytes(out, block)
    out.write(sync)
    return out.getvalue()
