"""Prometheus Remote Read wire codec (S7's HTTP edge, dependency-free).

The reference terminates the wire format with library calls:
``remote.DecodeReadRequest`` (snappy block format) + ``proto.Unmarshal``
into ``prompb.ReadRequest``, and the reverse on the response
(``pkg/promread/handler.go:65-107``). This container has neither a
snappy nor a protobuf package, so both codecs are implemented here
directly from their public wire specifications:

- snappy block format (google/snappy ``format_description.txt``):
  varint uncompressed length, then literal/copy tagged elements. The
  decompressor handles all four element kinds (including overlapping
  copies); the compressor emits a valid literal-only stream — correct
  per the spec and accepted by every snappy decoder, just not
  size-minimal (the API edge is not the engine's bottleneck).
- protobuf proto3 wire format for the prompb messages actually used by
  Remote Read (prometheus/prompb/remote.proto + types.proto):
  ReadRequest/Query/LabelMatcher in, ReadResponse/QueryResult/
  TimeSeries/Label/Sample out.

``handle_remote_read`` glues the codec to the engine surface
(``plans.remote_read.read_request``): snappy -> ReadRequest -> one
DataFrame plan per query -> TimeSeries assembly -> ReadResponse ->
snappy. Improvement kept deliberately: the reference iterates a Go map
so its timeseries order is nondeterministic (handler.go:216-220); here
series are sorted by their label sets, so responses are byte-stable.
"""

from __future__ import annotations

import struct
from typing import Iterator

from clickhouse_metrics_pipeline_spark.plans.matchers import LabelMatcher, MatchType

# --------------------------------------------------------------------------
# snappy block format
# --------------------------------------------------------------------------


def _uvarint_encode(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _uvarint_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def snappy_compress(data: bytes) -> bytes:
    """Literal-only snappy block stream (valid per the spec)."""
    out = bytearray(_uvarint_encode(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        n = len(chunk) - 1
        if n < 60:
            out.append(n << 2)  # tag 00, length in the upper 6 bits
        elif n < 256:
            out.append(60 << 2)
            out.append(n)
        else:
            out.append(61 << 2)
            out += struct.pack("<H", n)
        out += chunk
        pos += len(chunk)
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    """Full block-format decompressor: literals + 1/2/4-byte-offset
    copies, overlapping copies repeated byte-wise per the spec."""
    expected, pos = _uvarint_decode(data, 0)
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            n = tag >> 2
            if n >= 60:
                extra = n - 59  # 60..63 -> 1..4 length bytes, LE
                n = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            n += 1
            out += data[pos : pos + n]
            pos += n
            continue
        if kind == 1:  # copy, 1-byte offset
            length = 4 + ((tag >> 2) & 0x7)
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("invalid snappy copy offset")
        start = len(out) - offset
        for i in range(length):  # may overlap: copy byte-by-byte
            out.append(out[start + i])
    if len(out) != expected:
        raise ValueError(f"snappy length mismatch: {len(out)} != {expected}")
    return bytes(out)


# --------------------------------------------------------------------------
# proto3 wire format for the prompb Remote Read messages
# --------------------------------------------------------------------------


def _key(field: int, wire: int) -> bytes:
    return _uvarint_encode((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _key(field, 2) + _uvarint_encode(len(payload)) + payload


def _varint_field(field: int, value: int) -> bytes:
    if value < 0:
        value &= (1 << 64) - 1  # two's complement, proto3 int64
    return _key(field, 0) + _uvarint_encode(value)


def _iter_fields(data: bytes) -> Iterator[tuple[int, int, object]]:
    pos = 0
    while pos < len(data):
        key, pos = _uvarint_decode(data, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            value, pos = _uvarint_decode(data, pos)
        elif wire == 1:
            value = data[pos : pos + 8]
            pos += 8
        elif wire == 2:
            n, pos = _uvarint_decode(data, pos)
            value = data[pos : pos + n]
            pos += n
        elif wire == 5:
            value = data[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, value


def _int64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def decode_read_request(data: bytes) -> list[dict]:
    """prompb.ReadRequest -> [{start_ms, end_ms, matchers}] per Query."""
    queries = []
    for field, _, value in _iter_fields(data):
        if field != 1:  # accepted_response_types etc. — ignored
            continue
        q = {"start_ms": 0, "end_ms": 0, "matchers": []}
        for qf, _, qv in _iter_fields(value):
            if qf == 1:
                q["start_ms"] = _int64(qv)
            elif qf == 2:
                q["end_ms"] = _int64(qv)
            elif qf == 3:
                mtype, name, val = 0, "", ""
                for mf, _, mv in _iter_fields(qv):
                    if mf == 1:
                        mtype = mv
                    elif mf == 2:
                        name = mv.decode()
                    elif mf == 3:
                        val = mv.decode()
                q["matchers"].append(LabelMatcher(MatchType(mtype), name, val))
        queries.append(q)
    return queries


def encode_read_request(queries: list[dict]) -> bytes:
    """Inverse of :func:`decode_read_request` (test/client side)."""
    out = b""
    for q in queries:
        body = _varint_field(1, q.get("start_ms", 0))
        body += _varint_field(2, q.get("end_ms", 0))
        for m in q.get("matchers", []):
            mb = b""
            if m.type.value:
                mb += _varint_field(1, m.type.value)
            mb += _ld(2, m.name.encode()) + _ld(3, m.value.encode())
            body += _ld(3, mb)
        out += _ld(1, body)
    return out


def encode_read_response(results: list[list[dict]]) -> bytes:
    """[[{labels: dict, samples: [(value, ts_ms)]}]] -> prompb.ReadResponse."""
    out = b""
    for result in results:
        rb = b""
        for ts in result:
            tsb = b""
            for name in sorted(ts["labels"]):
                tsb += _ld(
                    1, _ld(1, name.encode()) + _ld(2, ts["labels"][name].encode())
                )
            for value, ts_ms in ts["samples"]:
                sb = _key(1, 1) + struct.pack("<d", float(value))
                sb += _varint_field(2, int(ts_ms))
                tsb += _ld(2, sb)
            rb += _ld(1, tsb)
        out += _ld(1, rb)
    return out


def decode_read_response(data: bytes) -> list[list[dict]]:
    """Inverse of :func:`encode_read_response` (test/client side)."""
    results = []
    for field, _, value in _iter_fields(data):
        if field != 1:
            continue
        result = []
        for rf, _, rv in _iter_fields(value):
            if rf != 1:
                continue
            labels: dict[str, str] = {}
            samples: list[tuple[float, int]] = []
            for tf, _, tv in _iter_fields(rv):
                if tf == 1:
                    name = val = ""
                    for lf, _, lv in _iter_fields(tv):
                        if lf == 1:
                            name = lv.decode()
                        elif lf == 2:
                            val = lv.decode()
                    labels[name] = val
                elif tf == 2:
                    v, t = 0.0, 0
                    for sf, _, sv in _iter_fields(tv):
                        if sf == 1:
                            v = struct.unpack("<d", sv)[0]
                        elif sf == 2:
                            t = _int64(sv)
                    samples.append((v, t))
            result.append({"labels": labels, "samples": samples})
        results.append(result)
    return results


# --------------------------------------------------------------------------
# HTTP-body handler: codec <-> engine surface
# --------------------------------------------------------------------------


def handle_remote_read(
    catalog,
    body: bytes,
    workspace_id: str | None = None,
    now_ms: int | None = None,
    limit: int = 100_000,
) -> bytes:
    """Snappy+protobuf request body -> snappy+protobuf response body.

    The full ServeHTTP dataflow (handler.go:65-107) minus the HTTP
    server object itself: decompress, decode, run every Query through
    the engine surface (``plans.remote_read.read_request``), assemble
    sorted TimeSeries, encode, compress. The per-query ``collect`` is
    the protocol edge — Remote Read responses are bounded payloads
    (``limit`` rows scanned per query), not engine-side relations."""
    import datetime as dt

    from clickhouse_metrics_pipeline_spark.plans.remote_read import read_request

    utc = dt.timezone.utc
    results = []
    for q in decode_read_request(snappy_decompress(body)):
        df = read_request(
            catalog,
            q["matchers"],
            start_ms=q["start_ms"],
            end_ms=q["end_ms"],
            workspace_id=workspace_id,
            now_ms=now_ms,
            limit=limit,
        )
        series = []
        # LOAD-BEARING BOUND: this collect + per-row loop is safe ONLY
        # because read_request caps the scan at `limit` rows (default
        # 100k, the same cap as the reference's LIMIT, handler.go:298)
        # before assembly — emitting a protobuf body is inherently a
        # driver-side serialization of a bounded payload, not a relation
        for row in df.collect():
            samples = [
                # Spark hands back naive datetimes in the session tz
                # (pinned to UTC by session.get_spark) — stamp the zone
                # explicitly so the OS tz can't shift the epoch math
                (s["value"], int(s["timestamp"].replace(tzinfo=utc).timestamp() * 1000))
                for s in row["samples"]
            ]
            series.append({"labels": dict(row["labels"]), "samples": samples})
        series.sort(key=lambda s: sorted(s["labels"].items()))
        results.append(series)
    return snappy_compress(encode_read_response(results))


# --------------------------------------------------------------------------
# prompb.WriteRequest (Prometheus Remote Write v1) — same dependency-free
# codec; WriteRequest.timeseries shares the TimeSeries message shape the
# ReadResponse codec above already speaks (labels=1, samples=2)
# --------------------------------------------------------------------------


def decode_write_request(data: bytes) -> list[dict]:
    """prompb.WriteRequest -> [{labels: dict, samples: [(value, ts_ms)]}].

    Field 1 is the repeated TimeSeries; metadata (field 3, RW 1.1) and
    exemplars are ignored — the same subset the reference's ingest
    consumes. Unknown fields skip per proto3 rules (_iter_fields)."""
    series = []
    for field, _, value in _iter_fields(data):
        if field != 1:
            continue
        labels: dict[str, str] = {}
        samples: list[tuple[float, int]] = []
        for tf, _, tv in _iter_fields(value):
            if tf == 1:
                name = val = ""
                for lf, _, lv in _iter_fields(tv):
                    if lf == 1:
                        name = lv.decode()
                    elif lf == 2:
                        val = lv.decode()
                labels[name] = val
            elif tf == 2:
                v, t = 0.0, 0
                for sf, _, sv in _iter_fields(tv):
                    if sf == 1:
                        v = struct.unpack("<d", sv)[0]
                    elif sf == 2:
                        t = _int64(sv)
                samples.append((v, t))
        series.append({"labels": labels, "samples": samples})
    return series


def encode_write_request(series: list[dict]) -> bytes:
    """Inverse of :func:`decode_write_request` (test/client side)."""
    out = b""
    for ts in series:
        tsb = b""
        for name in sorted(ts["labels"]):
            tsb += _ld(
                1, _ld(1, name.encode()) + _ld(2, ts["labels"][name].encode())
            )
        for value, ts_ms in ts["samples"]:
            sb = _key(1, 1) + struct.pack("<d", float(value))
            sb += _varint_field(2, int(ts_ms))
            tsb += _ld(2, sb)
        out += _ld(1, tsb)
    return out
