"""Generate the checked-in Prometheus Remote Read wire fixtures.

Run once; outputs land in tests/fixtures/. The bytes are derived HERE,
directly from the public wire specifications, independently of
clickhouse_metrics_pipeline_spark.plans.remote_read_wire — so the
fixtures can catch drift in that codec (a fixture generated *by* the
code under test would be circular).

Specs used (all public):
- protobuf proto3 wire format (varint tags, LEN fields)
- prometheus/prompb/remote.proto: ReadRequest{queries=1,
  accepted_response_types=2}, Query{start_timestamp_ms=1,
  end_timestamp_ms=2, matchers=3, hints=4}
- prometheus/prompb/types.proto: LabelMatcher{type=1,name=2,value=3},
  ReadHints{step_ms=1,func=2,start_ms=3,end_ms=4}
- google/snappy format_description.txt: block format = uvarint
  uncompressed length, then literal / copy elements.

The request mirrors what a real Prometheus server sends for
  {__name__="requests_total"} over [NOW-1h, NOW+1h]
with NOW = 2024-06-01 12:00:00 UTC (the seed-fixture clock,
sources/fixtures.py:_SEED_NOW): one Query with EQ matcher, filled
ReadHints, and accepted_response_types=[SAMPLES] — the two fields a
minimal client omits but a real server includes (drift guards for the
decoder's unknown-field handling).
"""

from __future__ import annotations

import os

T0 = 1717243200000  # 2024-06-01 12:00:00 UTC in ms
START = T0 - 3_600_000
END = T0 + 3_600_000


def uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def key(field: int, wire: int) -> bytes:
    return uvarint(field << 3 | wire)


def ld(field: int, payload: bytes) -> bytes:
    return key(field, 2) + uvarint(len(payload)) + payload


def vi(field: int, value: int) -> bytes:
    return key(field, 0) + uvarint(value)


def build_read_request() -> bytes:
    # LabelMatcher: type=EQ(0) omitted (proto3 default), name, value
    matcher = ld(2, b"__name__") + ld(3, b"requests_total")
    # ReadHints: step_ms/func omitted (defaults), start_ms=3, end_ms=4
    hints = vi(3, START) + vi(4, END)
    query = vi(1, START) + vi(2, END) + ld(3, matcher) + ld(4, hints)
    # accepted_response_types: packed repeated enum [SAMPLES=0]
    return ld(1, query) + ld(2, bytes([0]))


def build_minimal_request() -> bytes:
    """The same query as a minimal client marshals it: no hints, no
    accepted_response_types. Proto3 canonical marshal in field order —
    this is the byte-exact output expected from encode_read_request."""
    matcher = ld(2, b"__name__") + ld(3, b"requests_total")
    return ld(1, vi(1, START) + vi(2, END) + ld(3, matcher))


def snappy_frame_with_copy(payload: bytes) -> bytes:
    """Snappy-compress using a literal + one copy element, like a real
    compressor does on this payload: START's 6-byte varint appears
    twice (Query.start_timestamp_ms and ReadHints.start_ms), a >=4-byte
    match real snappy encodes as a copy. Exercises the decompressor's
    copy path through the exact bytes a real client could send."""
    needle = uvarint(START)
    first = payload.index(needle)
    second = payload.index(needle, first + len(needle))
    offset = second - first
    assert 1 <= offset < 2048 and 4 <= len(needle) <= 11
    out = uvarint(len(payload))
    head = payload[:second]
    # literal element: tag (len-1)<<2; long literals use extra bytes,
    # ours are < 60 so the short form applies
    assert len(head) < 60
    out += bytes([(len(head) - 1) << 2]) + head
    # copy with 2-byte offset (tag type 2): tag (len-1)<<2 | 2, then
    # offset little-endian
    out += bytes([((len(needle) - 1) << 2) | 2]) + offset.to_bytes(2, "little")
    tail = payload[second + len(needle):]
    assert 0 < len(tail) < 60
    out += bytes([(len(tail) - 1) << 2]) + tail
    return out


def main() -> None:
    fixdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
    )
    os.makedirs(fixdir, exist_ok=True)
    req = build_read_request()
    with open(os.path.join(fixdir, "prompb_read_request.bin"), "wb") as f:
        f.write(req)
    with open(
        os.path.join(fixdir, "prompb_read_request.snappy.bin"), "wb"
    ) as f:
        f.write(snappy_frame_with_copy(req))
    with open(
        os.path.join(fixdir, "prompb_read_request_minimal.bin"), "wb"
    ) as f:
        f.write(build_minimal_request())
    print("wrote fixtures:", fixdir)
    print("request bytes:", req.hex())


if __name__ == "__main__":
    main()
