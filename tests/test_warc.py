"""WARC-style record parsing — length-driven correctness."""
import pytest

from scrapely_spark.spark.warc import (build_warc_segment,
                                       parse_warc_segment,
                                       parse_warc_segments)


def test_parse_roundtrip_with_hostile_payloads():
    recs = [
        ("response", "http://a/1", "hello world"),
        # payload CONTAINS a fake record header — a delimiter-split
        # parser would shear here; the length-driven one must not
        ("response", "http://a/2",
         "WARC/1.0\r\nWARC-Type: fake\r\n\r\ngotcha"),
        ("request", "http://a/3", ""),
        ("response", "http://a/4", "x" * 1000),
    ]
    seg = build_warc_segment(recs)
    got = parse_warc_segment(seg)
    assert len(got) == 4
    for i, (t, u, p) in enumerate(recs):
        idx, typ, uri, length, payload, trunc = got[i]
        assert (idx, typ, uri, length, payload, trunc) == \
            (i, t, u, len(p), p, False)


def test_parse_truncation_and_garbage():
    seg = build_warc_segment([("response", "http://a/1", "abcdef")])
    # cut inside the payload
    cut = seg[:seg.index("abcdef") + 3]
    got = parse_warc_segment(cut)
    assert len(got) == 1
    assert got[0][4] == "abc" and got[0][5] is True
    # missing content-length header
    bad = "WARC/1.0\r\nWARC-Type: response\r\n\r\nrest"
    got = parse_warc_segment(bad)
    assert got[0][5] is True and got[0][3] is None
    # hostile negative declared length must not loop forever (pos
    # would walk backward and re-find the same magic): same invalid
    # path as a non-numeric length, and the parser still terminates
    neg = ("WARC/1.0\r\nWARC-Type: response\r\n"
           "Content-Length: -9999\r\n\r\n" + "x" * 10)
    got = parse_warc_segment(neg)
    assert len(got) == 1
    assert got[0][3] is None and got[0][5] is True
    # leading garbage before the first magic is skipped
    got = parse_warc_segment("garbage" + seg)
    assert len(got) == 1 and got[0][5] is False
    assert parse_warc_segment("") == []
    assert parse_warc_segment(None) == []


def test_parse_warc_segments_spark(spark):
    segs = []
    for s in range(6):
        recs = [("response", "http://h%d/u%d" % (s, i),
                 ("payload %d:%d " % (s, i)) * (i + 1))
                for i in range(s + 1)]
        segs.append(("seg%d" % s, build_warc_segment(recs)))
    df = spark.createDataFrame(segs, "segment_id string, segment string")
    out = parse_warc_segments(df).collect()
    assert len(out) == sum(s + 1 for s in range(6))
    by_seg = {}
    for r in out:
        by_seg.setdefault(r.segment_id, []).append(r)
    for sid, body in segs:
        want = parse_warc_segment(body)
        got = sorted(by_seg[sid], key=lambda r: r.record_idx)
        assert [(r.record_idx, r.warc_type, r.target_uri,
                 r.content_length, r.payload, r.truncated)
                for r in got] == want
        assert all(not r.truncated for r in got)


def test_revisit_records_dedup_and_references(spark):
    from scrapely_spark.spark.warc import revisit_records
    rows = [
        # capture order (segment_id, record_idx); 'AAAA' captured 3x
        ("s0", 0, "response", "http://h/a", "AAAA"),
        ("s0", 1, "response", "http://h/b", "BB"),
        ("s0", 2, "response", "http://h/a2", "AAAA"),
        ("s1", 0, "response", "http://h/a3", "AAAA"),
        # request records never deduplicate
        ("s1", 1, "request", "http://h/a", "AAAA"),
    ]
    df = spark.createDataFrame(
        rows, "segment_id string, record_idx int, warc_type string, "
              "target_uri string, payload string")
    got = {(r.segment_id, r.record_idx): r
           for r in revisit_records(df).collect()}
    assert len(got) == 4  # the request row is gone
    first = got[("s0", 0)]
    assert first.record_type == "response" and first.saved_bytes == 0
    assert first.refers_to_segment is None
    for key in [("s0", 2), ("s1", 0)]:
        r = got[key]
        assert r.record_type == "revisit"
        assert (r.refers_to_segment, r.refers_to_idx) == ("s0", 0)
        assert r.refers_to_uri == "http://h/a"
        assert r.saved_bytes == 4
    assert got[("s0", 1)].record_type == "response"
    # archive-compression headline: sum(saved) = 2 dup payloads
    assert sum(r.saved_bytes for r in got.values()) == 8


def test_robots_fetch_policy_ladder(spark):
    from scrapely_spark.frontier.robots import fetch_policy
    rows = [("a", 200, None), ("b", 204, 5), ("c", 301, None),
            ("d", 404, None), ("e", 503, 10),   # unreachable, fresh cache
            ("f", 503, 45),                      # unreachable, stale cache
            ("g", 500, None),                    # unreachable, no cache
            ("h", None, 3),                      # no response, fresh cache
            ("i", None, None)]
    df = spark.createDataFrame(
        rows, "host string, status int, cache_age_days int")
    got = {r.host: (r.policy, r.fetchable)
           for r in fetch_policy(df).collect()}
    assert got == {
        "a": ("use_live", True), "b": ("use_live", True),
        "c": ("follow_redirect", True), "d": ("allow_all", True),
        "e": ("use_cached", True), "f": ("disallow_all", False),
        "g": ("disallow_all", False), "h": ("use_cached", True),
        "i": ("disallow_all", False)}


def test_content_length_is_bytes_not_characters():
    # ISO 28500 declares BYTE lengths; a multi-byte payload must
    # roundtrip exactly (a character-counting parser would overrun
    # into the next record and shear the rest of the segment)
    recs = [
        ("response", "http://a/1", "café crème — 1000"),
        ("response", "http://a/2", "plain ascii after it"),
    ]
    seg = build_warc_segment(recs)
    got = parse_warc_segment(seg)
    assert len(got) == 2
    for i, (t, u, p) in enumerate(recs):
        idx, typ, uri, length, payload, trunc = got[i]
        assert (typ, uri, payload, trunc) == (t, u, p, False)
        assert length == len(p.encode("utf-8"))


def test_unknown_length_stops_instead_of_forging_records():
    # a record with no Content-Length has an unknowable extent —
    # resynchronizing on the next magic would land INSIDE its payload
    # and mint an attacker-controlled 'clean' record
    evil = ("WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: http://victim/\r\n\r\n"
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: http://evil/\r\n"
            "Content-Length: 5\r\n\r\nxxxxx\r\n\r\n")
    got = parse_warc_segment(evil)
    assert len(got) == 1
    assert got[0][2] == "http://victim/" and got[0][5] is True
    assert all(r[2] != "http://evil/" for r in got)


def test_trailing_garbage_surfaces_as_truncated_row():
    seg = build_warc_segment([("response", "http://a/1", "abc")])
    got = parse_warc_segment(seg + "trailing junk without magic")
    assert len(got) == 2
    assert got[0][5] is False
    assert got[1][5] is True and got[1][3] is None


def test_revisit_order_is_natural_for_numeric_segment_suffixes(spark):
    from scrapely_spark.spark.warc import revisit_records

    rows = [("seg10", 0, "response", "http://a/1", 5, "same", False),
            ("seg2", 0, "response", "http://a/2", 5, "same", False)]
    df = spark.createDataFrame(
        rows, "segment_id string, record_idx int, warc_type string, "
              "target_uri string, content_length int, payload string, "
              "truncated boolean")
    out = {r.segment_id: r for r in revisit_records(df).collect()}
    # seg2 wrote first (natural order): it stays the response
    assert out["seg2"].record_type == "response"
    assert out["seg10"].record_type == "revisit"
    assert out["seg10"].refers_to_segment == "seg2"
