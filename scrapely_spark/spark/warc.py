"""WARC-style record parsing — the archive source format of web-scale
crawling (ISO 28500; the format Common Crawl ships).

A WARC file is a concatenation of records, each::

    WARC/1.0\r\n
    <header-name>: <value>\r\n        (repeated)
    \r\n
    <payload of exactly Content-Length bytes>\r\n\r\n

Parsing is LENGTH-DRIVEN: the payload may contain anything, including
bytes that look like a record header, so a correct parser must slice
``Content-Length`` bytes rather than split on a delimiter.  That makes
the kernel a per-segment Python state machine inside an Arrow batch —
the same mandated kernel shape as the HTML extraction path (SURVEY
§7.0): embarrassingly parallel across segments, zero shuffles, and the
segment is the natural unit of parallelism (Common Crawl ships ~1 GiB
segment files; ``spark.read`` text/binaryFile gives one row per
segment or per chunk).

Scale shape: ``mapInPandas`` over the segments table — each executor
parses its own segments; record rows are emitted with
``(segment_id, record_idx)`` so downstream work can re-sort or join
without ever re-reading the raw bytes.  Malformed trailing bytes are
surfaced as a final ``truncated=true`` record, never silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RECORD_SCHEMA = ("segment_id string, record_idx int, warc_type string, "
                 "target_uri string, content_length int, "
                 "payload string, truncated boolean")

_MAGIC = "WARC/1.0\r\n"


def parse_warc_segment(segment: str) -> list:
    """Pure-Python single-segment parser (oracle twin of the kernel).

    Returns ``[(record_idx, warc_type, target_uri, content_length,
    payload, truncated), ...]``.  Length-driven IN BYTES: the segment
    re-encodes to UTF-8 (recovering the original file bytes of a
    text-read archive) and exactly ``Content-Length`` BYTES are
    consumed after the blank line — ISO 28500 declares byte lengths,
    and counting characters would mis-slice every record after the
    first multi-byte character.  A record whose payload or terminator
    runs past the segment end is emitted with ``truncated=True`` and
    whatever payload prefix exists (a byte-boundary-split character
    decodes with U+FFFD rather than raising).

    Two hostile-input rules: a record with a missing/invalid
    Content-Length STOPS the segment parse (emitted truncated) — the
    parser cannot know where that record ends, and re-synchronizing on
    the next magic would let a payload-embedded fake header mint a
    forged clean record; trailing bytes with no record magic surface
    as a final ``truncated=True`` row, never silently dropped.
    """
    out = []
    data = (segment or "").encode("utf-8", "surrogatepass")
    magic = _MAGIC.encode()
    pos, idx = 0, 0
    n = len(data)

    def dec(b: bytes) -> str:
        return b.decode("utf-8", "replace")

    while pos < n:
        start = data.find(magic, pos)
        if start < 0:
            if data[pos:]:
                out.append((idx, None, None, None, "", True))
            break
        pos = start + len(magic)
        headers = {}
        while True:
            eol = data.find(b"\r\n", pos)
            if eol < 0:  # header block runs off the segment
                out.append((idx, headers.get("warc-type"),
                            headers.get("warc-target-uri"), None, "",
                            True))
                return out
            line = dec(data[pos:eol])
            pos = eol + 2
            if line == "":
                break
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = None
        if length is not None and length < 0:
            # a negative declared length would move ``pos`` backward —
            # hostile header; same invalid path as a non-numeric one
            length = None
        if length is None:
            # unknown extent: emit and STOP — scanning forward for the
            # next magic would resynchronize INSIDE this record's
            # unskippable payload and forge records from its bytes
            out.append((idx, headers.get("warc-type"),
                        headers.get("warc-target-uri"), None, "", True))
            return out
        payload = data[pos:pos + length]
        truncated = (len(payload) < length
                     or data[pos + length:pos + length + 4]
                     != b"\r\n\r\n")
        out.append((idx, headers.get("warc-type"),
                    headers.get("warc-target-uri"), length,
                    dec(payload), truncated))
        pos = pos + length + 4
        idx += 1
    return out


def parse_warc_segments(segments: DataFrame,
                        id_col: str = "segment_id",
                        body_col: str = "segment") -> DataFrame:
    """Segments table ``(segment_id, segment)`` → one row per WARC
    record, via an Arrow-batched ``mapInPandas`` kernel around
    :func:`parse_warc_segment`.
    """
    from typing import Iterator

    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["segment_id", "record_idx", "warc_type", "target_uri",
                "content_length", "payload", "truncated"]
        for batch in batches:
            rows = []
            for sid, body in zip(batch[id_col], batch[body_col]):
                for rec in parse_warc_segment(body):
                    rows.append((sid,) + rec)
            yield pd.DataFrame(rows, columns=cols)

    return segments.select(id_col, body_col).mapInPandas(
        kernel, RECORD_SCHEMA)


def build_warc_segment(records: list) -> str:
    """Render ``(warc_type, target_uri, payload)`` triples as one
    WARC-style segment string — the deterministic synthesizer the
    tests and the driver row share (payloads may contain ANYTHING,
    including fake record headers; the length-driven parser must not
    care)."""
    parts = []
    for warc_type, uri, payload in records:
        parts.append(_MAGIC
                     + "WARC-Type: %s\r\n" % warc_type
                     + "WARC-Target-URI: %s\r\n" % uri
                     # BYTE length (the ISO 28500 contract the parser
                     # consumes), not character count
                     + "Content-Length: %d\r\n"
                     % len(payload.encode("utf-8"))
                     + "\r\n" + payload + "\r\n\r\n")
    return "".join(parts)


def revisit_records(records: DataFrame) -> DataFrame:
    """Identical-payload-digest revisit dedup (WARC 1.1 §6.7.2) — the
    archive-side dedup every large crawl store runs: the FIRST capture
    of a payload stays a full ``response`` record; every later capture
    of a byte-identical payload is written as a ``revisit`` record
    that references the original and stores NO payload.  At Common
    Crawl scale this is roughly a third of all archive bytes.

    Input is the :func:`parse_warc_segments` shape; only
    ``warc_type = 'response'`` rows participate (request/metadata
    records are never deduplicated).  Capture order is
    ``(length(segment_id), segment_id, record_idx)`` — natural order
    for the numeric-suffix segment naming crawl writers use ('seg2'
    precedes 'seg10'; plain lexicographic would not), deterministic
    for any naming.

    Emits (segment_id, record_idx, target_uri, payload_digest,
    record_type, refers_to_segment, refers_to_idx, refers_to_uri,
    saved_bytes): ``saved_bytes`` is the payload length a revisit
    record avoids storing (0 for responses), so a plain SUM over the
    output is the archive-compression headline.

    Scale shape: ONE shuffle keyed by the sha-256 digest — uniform by
    construction (identical payloads are exactly what the key
    collapses, the same argument as ``exact_image_dedup``) — then a
    per-digest window; nothing else moves.  The payload column is
    dropped before the shuffle: only (ids, uri, digest, length) travel.
    """
    from pyspark.sql import Window, functions as F

    digest = F.sha2(F.col("payload"), 256)
    staged = (records.where(F.col("warc_type") == "response")
              .select("segment_id", "record_idx", "target_uri",
                      F.length("payload").cast("long").alias("_n"),
                      digest.alias("payload_digest")))
    w = (Window.partitionBy("payload_digest")
         .orderBy(F.length("segment_id"), "segment_id", "record_idx"))
    rn = F.row_number().over(w)
    first_seg = F.first("segment_id").over(w)
    first_idx = F.first("record_idx").over(w)
    first_uri = F.first("target_uri").over(w)
    out = staged.select(
        "segment_id", "record_idx", "target_uri", "payload_digest",
        rn.alias("_rn"), first_seg.alias("_fs"),
        first_idx.alias("_fi"), first_uri.alias("_fu"), "_n")
    is_rev = F.col("_rn") > 1
    return out.select(
        "segment_id", "record_idx", "target_uri", "payload_digest",
        F.when(is_rev, F.lit("revisit")).otherwise(F.lit("response"))
        .alias("record_type"),
        F.when(is_rev, F.col("_fs")).alias("refers_to_segment"),
        F.when(is_rev, F.col("_fi")).alias("refers_to_idx"),
        F.when(is_rev, F.col("_fu")).alias("refers_to_uri"),
        F.when(is_rev, F.col("_n")).otherwise(F.lit(0).cast("long"))
        .alias("saved_bytes"))
