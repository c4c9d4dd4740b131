"""Snappy block compression implemented from scratch (the public
``format_description.txt`` wire format), so the Avro OCF connector's
``snappy`` codec needs no third-party library — the same
engine-logic-vs-vendor-artifact split as the rest of
``sources/avro_ocf.py``: the FORMAT is fully specified and testable;
only Google's C++ implementation is environmental.

Wire format (format_description.txt):

* Preamble: the UNCOMPRESSED length as a little-endian base-128
  varint (7 bits per byte, high bit = continuation) — note this is
  NOT Avro's zigzag varint; lengths are unsigned.
* A sequence of elements, each led by a tag byte whose low 2 bits
  select the type:

  - ``00`` literal — length-1 in the tag's upper 6 bits when length
    ≤ 60; values 60..63 mean (length-1) follows in the next 1..4
    little-endian bytes;
  - ``01`` copy, 1-byte offset — length 4..11 as ``(tag>>2)&7 + 4``,
    11-bit offset as ``(tag>>5)<<8 | next_byte``;
  - ``10`` copy, 2-byte little-endian offset — length 1..64 as
    ``(tag>>2)+1``;
  - ``11`` copy, 4-byte little-endian offset — same length rule
    (only needed past 64 KiB windows; the compressor here never
    emits it because it matches within 64 KiB blocks, but the
    decompressor accepts it).

* Copies may OVERLAP their own output (offset < length) — the
  LZ77 run-extension trick — so expansion must be byte-sequential
  (or chunked by ``offset`` bytes, as below). Offset 0 is invalid,
  as is an offset reaching before the start of the output.

The compressor is the reference scheme's greedy matcher: a
last-position hash table over 4-byte sequences, scanned per 64 KiB
block (so every offset fits the 2-byte form), with the reference's
"bail quickly on incompressible data" skip heuristic (step grows
every 32 misses). Any valid stream is acceptable output — Snappy
does not canonicalize — and decompress(compress(x)) == x is pinned
by unit + hypothesis tests (tests/test_round13c.py).

Avro's ``snappy`` codec (Avro 1.11 spec, "Required Codecs") appends
the 4-byte BIG-ENDIAN CRC32 of the UNCOMPRESSED block data after
each compressed block — helpers for that live in avro_ocf.py; this
module is pure Snappy.
"""

from __future__ import annotations

_MAX_UNCOMPRESSED = (1 << 32) - 1
_BLOCK = 1 << 16  # reference block size: offsets stay 2-byte
_MIN_MATCH = 4
_MAX_COPY_LEN = 64


def _uvarint_encode(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _uvarint_decode(buf, pos: int) -> tuple[int, int]:
    shift = 0
    n = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy: truncated length preamble")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")


def _emit_literal(out: bytearray, data, lo: int, hi: int) -> None:
    """Append one literal element covering data[lo:hi] (any length)."""
    n = hi - lo
    while n > 0:
        # one literal element can carry up to 2^32 bytes, but chunking
        # at 2^16 keeps the length encoding in the common 2-byte form
        take = min(n, _BLOCK)
        if take <= 60:
            out.append((take - 1) << 2)
        elif take <= 0x100:
            out.append(60 << 2)
            out.append(take - 1)
        else:
            out.append(61 << 2)
            out += (take - 1).to_bytes(2, "little")
        out += data[lo : lo + take]
        lo += take
        n -= take


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    """Append copy elements for a match of *length* at *offset*
    (≤ 65535 — the compressor matches within one 64 KiB block)."""
    # long matches split into ≤64-byte copies; keep the final chunk
    # ≥ 4 so the 1-byte-offset fast form stays available to it
    while length >= _MAX_COPY_LEN + _MIN_MATCH:
        out.append(((_MAX_COPY_LEN - 1) << 2) | 2)
        out += offset.to_bytes(2, "little")
        length -= _MAX_COPY_LEN
    if length > _MAX_COPY_LEN:
        half = length - _MIN_MATCH  # 61..64-4 → leaves ≥4
        out.append(((half - 1) << 2) | 2)
        out += offset.to_bytes(2, "little")
        length -= half
    if 4 <= length <= 11 and offset < 2048:
        out.append(((offset >> 8) << 5) | ((length - 4) << 2) | 1)
        out.append(offset & 0xFF)
    else:
        out.append(((length - 1) << 2) | 2)
        out += offset.to_bytes(2, "little")


def compress(data: bytes) -> bytes:
    """Greedy per-64KiB-block matcher producing a spec-valid stream."""
    if len(data) > _MAX_UNCOMPRESSED:
        raise ValueError("snappy: input exceeds 2**32-1 bytes")
    data = bytes(data)
    out = bytearray(_uvarint_encode(len(data)))
    for base in range(0, len(data), _BLOCK):
        _compress_block(out, data, base, min(base + _BLOCK, len(data)))
    return bytes(out)


def _compress_block(out: bytearray, data: bytes, base: int, end: int) -> None:
    n = end - base
    if n < _MIN_MATCH + 1:
        _emit_literal(out, data, base, end)
        return
    table: dict[bytes, int] = {}
    i = base
    lit_start = base
    limit = end - _MIN_MATCH
    skip = 32  # reference heuristic: step = skip>>5, grows on misses
    while i <= limit:
        key = data[i : i + _MIN_MATCH]
        cand = table.get(key)
        table[key] = i
        if cand is None:  # exact-bytes keys: a hit is always a match
            skip += 1
            i += skip >> 5
            continue
        # extend the match forward
        m = i + _MIN_MATCH
        c = cand + _MIN_MATCH
        while m < end and data[m] == data[c]:
            m += 1
            c += 1
        _emit_literal(out, data, lit_start, i)
        _emit_copy(out, i - cand, m - i)
        # seed the table at the match tail so runs chain
        if m <= limit:
            table[data[m - 1 : m - 1 + _MIN_MATCH]] = m - 1
        i = m
        lit_start = m
        skip = 32
    _emit_literal(out, data, lit_start, end)


def decompress(buf: bytes) -> bytes:
    """Strict decoder: validates the preamble length, every tag's
    operand bytes, offsets (0 or out-of-window raise), and that the
    stream decodes to EXACTLY the promised length with no trailing
    elements."""
    total, pos = _uvarint_decode(buf, pos=0)
    if total > _MAX_UNCOMPRESSED:
        raise ValueError("snappy: declared length exceeds 2**32-1")
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59  # 1..4 length bytes
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(buf[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal")
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:
            if pos >= n:
                raise ValueError("snappy: truncated copy-1 offset")
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2 offset")
            length = (tag >> 2) + 1
            offset = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4 offset")
            length = (tag >> 2) + 1
            offset = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if offset == 0:
            raise ValueError("snappy: zero copy offset")
        if offset > len(out):
            raise ValueError("snappy: copy offset before stream start")
        if len(out) + length > total:
            raise ValueError("snappy: output exceeds declared length")
        if offset >= length:
            start = len(out) - offset
            out += out[start : start + length]
        else:
            # overlapping run: double the copied span chunk-by-chunk
            # (byte-sequential semantics, O(length) total)
            start = len(out) - offset
            chunk = bytes(out[start:])
            while len(chunk) < length:
                chunk = chunk + chunk
            out += chunk[:length]
    if len(out) != total:
        raise ValueError(
            f"snappy: stream decoded to {len(out)} bytes, "
            f"preamble promised {total}"
        )
    return bytes(out)
