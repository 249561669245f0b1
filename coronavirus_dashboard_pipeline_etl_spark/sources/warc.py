"""WARC (ISO 28500) crawl-archive source — the de-facto web-crawl
format (Common Crawl et al.) every training-data pipeline ingests.

The reference ingests only its own blob formats; a corpus-scale
engine's front door is WARC, so this is a beyond-reference source in
the same spirit as the multimodal codecs: a REAL byte-level parser,
no external library.

Distributed shape: ``spark.read.format("binaryFile")`` gives one row
per ``.warc``/``.warc.gz`` file (at crawl scale, one task per archive
segment — the unit Common Crawl ships, sized for exactly this);
records are framed inside an Arrow-batched ``mapInPandas`` by the
spec's ``WARC/1.x`` header + ``Content-Length`` + CRLF CRLF CRLF
structure. Gzip members (the standard per-record gzip framing) are
inflated with stdlib zlib. No shuffle anywhere — parsing inherits the
file-split layout.

``build_warc`` is the forward half (the same builder-half discipline
as the codecs): it frames records spec-correctly — with per-record
gzip members when asked — so the parser's framing walk is
load-bearing in tests and the w13 gate.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

_CRLF = b"\r\n"

WARC_SCHEMA = (
    "source_file string, record_type string, target_uri string, "
    "warc_date string, content_length long, content binary"
)


def build_warc(records: list, gzip_members: bool = False) -> bytes:
    """Assemble a spec-shaped WARC file from ``(record_type,
    target_uri, warc_date, payload_bytes)`` tuples. With
    ``gzip_members=True`` each record becomes its own gzip member —
    the framing Common Crawl uses so records are individually
    seekable."""
    import gzip as _gzip

    out = []
    for rtype, uri, date, payload in records:
        head = [b"WARC/1.0"]
        head.append(b"WARC-Type: " + rtype.encode())
        if uri is not None:
            head.append(b"WARC-Target-URI: " + uri.encode())
        head.append(b"WARC-Date: " + date.encode())
        head.append(b"Content-Length: " + str(len(payload)).encode())
        raw = (
            _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        )
        out.append(
            _gzip.compress(raw, 6, mtime=0) if gzip_members else raw
        )
    return b"".join(out)


def parse_warc_bytes(buf: bytes, source: str = "") -> list:
    """Byte-level WARC record walk: version line, header block to the
    blank line, ``Content-Length`` payload read, trailing CRLF CRLF.
    Concatenated gzip members are inflated first (multi-member streams
    handled by repeated decompressobj passes). Returns rows matching
    WARC_SCHEMA. Loud on malformed framing."""
    import zlib

    if buf[:2] == b"\x1f\x8b":  # gzip member(s)
        parts, data = [], buf
        while data:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            parts.append(d.decompress(data))
            parts.append(d.flush())
            data = d.unused_data
        buf = b"".join(parts)
    rows = []
    pos = 0
    while pos < len(buf):
        # tolerate extra record separators
        while buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= len(buf):
            break
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(
                f"{source or 'WARC'}: bad record header at byte {pos}"
            )
        hdr_end = buf.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError(f"{source or 'WARC'}: unterminated header")
        headers: dict[str, str] = {}
        lines = buf[pos:hdr_end].split(_CRLF)
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode().lower()] = v.strip().decode()
        if "content-length" not in headers:
            raise ValueError(f"{source or 'WARC'}: missing Content-Length")
        n = int(headers["content-length"])
        body_start = hdr_end + 4
        payload = buf[body_start : body_start + n]
        if len(payload) != n:
            raise ValueError(
                f"{source or 'WARC'}: payload truncated "
                f"({len(payload)} < {n})"
            )
        rows.append(
            (
                source,
                headers.get("warc-type", ""),
                headers.get("warc-target-uri"),
                headers.get("warc-date", ""),
                n,
                payload,
            )
        )
        pos = body_start + n
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC source: one binaryFile row per archive, records framed in
    Arrow batches. Returns WARC_SCHEMA rows — filter
    ``record_type = 'response'`` and decode ``content`` downstream."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select(
        F.col("path"), F.col("content").alias("__bytes")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "source_file": [], "record_type": [], "target_uri": [],
                "warc_date": [], "content_length": [], "content": [],
            }
            for pth, data in zip(pdf["path"], pdf["__bytes"]):
                for row in parse_warc_bytes(bytes(data), source=str(pth)):
                    for key, val in zip(out, row):
                        out[key].append(val)
            yield pd.DataFrame(out)

    return files.mapInPandas(parse, WARC_SCHEMA)
