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
    payload, truncated), ...]``.  Length-driven: after the blank line,
    exactly ``Content-Length`` characters are consumed, then the
    ``\\r\\n\\r\\n`` record terminator.  A record whose payload or
    terminator runs past the segment end is emitted with
    ``truncated=True`` and whatever payload prefix exists.
    """
    out = []
    pos, idx = 0, 0
    n = len(segment or "")
    while pos < n:
        start = (segment or "").find(_MAGIC, pos)
        if start < 0:
            break
        pos = start + len(_MAGIC)
        headers = {}
        while True:
            eol = segment.find("\r\n", pos)
            if eol < 0:  # header block runs off the segment
                out.append((idx, headers.get("warc-type"),
                            headers.get("warc-target-uri"), None, "",
                            True))
                return out
            line = segment[pos:eol]
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
            # a negative declared length would move ``pos`` backward,
            # and str.find with a negative start clamps to 0 — the
            # parser would re-find the same record forever.  Hostile
            # header; take the same invalid path as a non-numeric one.
            length = None
        if length is None:
            out.append((idx, headers.get("warc-type"),
                        headers.get("warc-target-uri"), None, "", True))
            idx += 1
            continue
        payload = segment[pos:pos + length]
        truncated = (len(payload) < length
                     or segment[pos + length:pos + length + 4]
                     != "\r\n\r\n")
        out.append((idx, headers.get("warc-type"),
                    headers.get("warc-target-uri"), length, payload,
                    truncated))
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
                     + "Content-Length: %d\r\n" % len(payload)
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
    ``(segment_id, record_idx)`` — the stable order the archive was
    written in — so the election is deterministic.

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
         .orderBy("segment_id", "record_idx"))
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
