"""Multimodal operator plumbing + the CLI template-store tool."""

from __future__ import annotations

import json
import subprocess
import sys

import numpy as np
import pytest

from scrapely_spark.spark import codec, datagen, multimodal

N = 48


def test_decode_stats(spark):
    images = datagen.images_df(spark, N)
    rows = multimodal.decode_stats(images).collect()
    assert len(rows) == N
    for r in rows:
        i = int(r.image_id.split("-")[1])
        _id, w, h, fmt = datagen.image_meta(i)
        assert (r.w, r.h, r.fmt) == (w, h, fmt)
        assert 0 <= r.mean_luma <= 255
        if r.fmt == "png":
            assert r.phash_match  # lossless roundtrip keeps the phash


def test_resize_roundtrip(spark):
    images = datagen.images_df(spark, N)
    rows = multimodal.resize(images, 12, 10).collect()
    assert len(rows) == N
    for r in rows[:5]:
        pixels, w, h, _fmt = codec.decode_image(bytes(r.bytes))
        assert (w, h) == (12, 10)
        assert pixels.shape == (10, 12, 3)


def test_phash_column_matches_table(spark):
    images = datagen.images_df(spark, N)
    recomputed = multimodal.phash_column(images).withColumnRenamed(
        "phash", "phash2")
    joined = images.select("image_id", "phash", "fmt").join(
        recomputed, "image_id").collect()
    for r in joined:
        if r.fmt == "png":
            assert r.phash == r.phash2, r.image_id


def test_frame_sample_decodes_and_meets_psnr(spark):
    truth = {
        vid: codec.frames_for(vid, 24, 18, n)
        for vid, n in (("v1", 7), ("v2", 61), ("v3", 1))}
    rows = [(vid, bytearray(codec.encode_video(frames, "jpeg")))
            for vid, frames in truth.items()]
    videos = spark.createDataFrame(rows, "video_id string, bytes binary")
    out = multimodal.frame_sample(videos, every_n=30).collect()

    got = {(r.video_id, r.frame_index): bytes(r.frame_bytes) for r in out}
    # every_n=30: v1(7 frames)->{0}, v2(61)->{0,30,60}, v3(1)->{0}
    assert set(got) == {("v1", 0), ("v2", 0), ("v2", 30), ("v2", 60),
                        ("v3", 0)}
    # emitted frames are standalone image payloads meeting the lossy
    # acceptance bar against the regenerable ground truth
    for (vid, idx), blob in got.items():
        pixels, w, h, fmt = codec.decode_image(blob)
        assert (w, h, fmt) == (24, 18, "jpeg")
        assert codec.psnr(pixels, truth[vid][idx]) >= 40.0


def test_frame_sample_lossless_roundtrip():
    frames = codec.frames_for("vv", 10, 8, 5)
    blob = codec.encode_video(frames, "png")
    assert codec.video_meta(blob) == (10, 8, 5, "png")
    for i, fb in codec.iter_video_frames(blob, [0, 2, 4]):
        pixels, _, _, _ = codec.decode_image(fb)
        assert (pixels == frames[i]).all()


def test_frame_sample_unknown_container_is_decode_boundary(spark):
    videos = spark.createDataFrame(
        [("v1", bytearray(b"fake"))], "video_id string, bytes binary")
    with pytest.raises(Exception) as err:
        multimodal.frame_sample(videos).collect()
    assert "NotImplementedError" in str(err.value) or \
        isinstance(err.value, NotImplementedError)


def test_cli_template_store(tmp_path):
    page = tmp_path / "page.html"
    page.write_text("<html><body><h1>Walnut Desk</h1>"
                    "<p>solid walnut, oiled</p></body></html>")
    page2 = tmp_path / "page2.html"
    page2.write_text("<html><body><h1>Oak Table</h1>"
                     "<p>solid oak, waxed</p></body></html>")
    store = str(tmp_path / "store.json")

    def run(*args):
        return subprocess.run(
            [sys.executable, "-m", "scrapely_spark.tool", store, *args],
            capture_output=True, text=True, cwd="/root/repo")

    out = run("ta", str(page), "name=Walnut Desk", "blurb=solid walnut, oiled")
    assert out.returncode == 0, out.stderr
    assert "[0] template added" in out.stdout

    out = run("tl")
    assert "page.html" in out.stdout

    out = run("s", str(page2))
    assert out.returncode == 0, out.stderr
    assert "Oak Table" in out.stdout and "solid oak, waxed" in out.stdout

    with open(store) as fh:
        assert len(json.load(fh)["templates"]) == 1

    out = run("td", "0")
    assert "deleted" in out.stdout
    with open(store) as fh:
        assert json.load(fh)["templates"] == []


def test_cli_annotate_and_ls_annotations(tmp_path):
    """Parity with reference IblTool do_annotate / do_ls_annotations
    (scrapely/tool.py:55-93): `a` without --field tests a criteria,
    with --field it annotates and saves; `al` lists annotations."""
    page = tmp_path / "page.html"
    page.write_text("<html><body><h1>Walnut Desk</h1>"
                    "<p>solid walnut, oiled</p>"
                    "<span>USD 129</span></body></html>")
    store = str(tmp_path / "store.json")

    def run(*args):
        return subprocess.run(
            [sys.executable, "-m", "scrapely_spark.tool", store, *args],
            capture_output=True, text=True, cwd="/root/repo")

    out = run("ta", str(page), "name=Walnut Desk")
    assert out.returncode == 0, out.stderr

    # test mode: shows what would be annotated, does not modify store
    out = run("a", "0", "USD 129")
    assert out.returncode == 0, out.stderr
    assert "USD 129" in out.stdout and out.stdout.startswith("[0]")
    before = open(store).read()

    out = run("al", "0")
    assert out.returncode == 0, out.stderr
    assert "(name)" in out.stdout and "Walnut Desk" in out.stdout
    assert "price" not in out.stdout
    assert open(store).read() == before  # read-only commands

    # annotate mode: adds the annotation and persists it
    out = run("a", "0", "USD 129", "--field", "price")
    assert out.returncode == 0, out.stderr
    assert "[new] (price)" in out.stdout

    out = run("al", "0")
    assert "(price)" in out.stdout and "(name)" in out.stdout
    # the template now extracts both fields from a sibling page
    page2 = tmp_path / "page2.html"
    page2.write_text("<html><body><h1>Oak Table</h1>"
                     "<p>solid oak, waxed</p>"
                     "<span>USD 240</span></body></html>")
    out = run("s", str(page2))
    assert "Oak Table" in out.stdout and "USD 240" in out.stdout


def test_scraper_train_and_scrape_url(tmp_path):
    """Reference Scraper.train/scrape URL conveniences
    (scrapely/__init__.py:46-52) through the file:// path."""
    from scrapely_spark.scraper import Scraper
    page = tmp_path / "train.html"
    page.write_text("<html><body><h1>Nice Chair</h1>"
                    "<p>beech, natural</p></body></html>")
    other = tmp_path / "other.html"
    other.write_text("<html><body><h1>Red Sofa</h1>"
                     "<p>velvet, crimson</p></body></html>")
    s = Scraper()
    s.train("file://%s" % page, {"name": "Nice Chair",
                                 "desc": "beech, natural"})
    [rec] = s.scrape("file://%s" % other)
    assert rec["name"] == [u"Red Sofa"]
    assert rec["desc"] == [u"velvet, crimson"]


def test_phash_near_dups_vs_brute_force(spark):
    """Banded candidates + bit_count verify == brute-force hamming pairs."""
    from pyspark.sql import functions as F
    from itertools import combinations

    base = datagen.images_df(spark, 24).select("image_id", "phash")
    # planted near-duplicates: copies with 1-3 phash bits flipped
    twins = base.select(
        F.concat(F.col("image_id"), F.lit("~dup")).alias("image_id"),
        F.col("phash").bitwiseXOR(
            F.when(F.col("phash") % 3 == 0, F.lit(1))
            .when(F.col("phash") % 3 == 1, F.lit(1 + 4))
            .otherwise(F.lit(1 + 4 + 16))).alias("phash"))
    images = base.unionByName(twins)

    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in multimodal.phash_near_dups(images, max_hamming=3).collect())

    rows = {r.image_id: r.phash for r in images.collect()}
    want = sorted(
        (a, b, bin(rows[a] ^ rows[b]).count("1"))
        for a, b in combinations(sorted(rows), 2)
        if bin(rows[a] ^ rows[b]).count("1") <= 3)
    assert got == want
    assert len(got) >= 24  # every planted twin found


def test_phash_near_dups_recall_guard(spark):
    images = datagen.images_df(spark, 4).select("image_id", "phash")
    with pytest.raises(ValueError):
        multimodal.phash_near_dups(images, max_hamming=4, n_chunks=4)


def test_phash_near_dups_hot_bucket_capped(spark):
    """A constant-phash column (mirrored logo) must not go quadratic."""
    from pyspark.sql import functions as F
    clones = spark.range(500).select(
        F.concat(F.lit("img-"), F.col("id")).alias("image_id"),
        F.lit(1234567).cast("long").alias("phash"))
    out = multimodal.phash_near_dups(clones, max_bucket=100)
    assert out.count() == 0  # dropped by the cap, not O(n^2) verified


def test_cli_interactive_repl(tmp_path):
    """The cmd.Cmd shell mirrors a reference IblTool session
    (scrapely/tool.py:10-111): add_template -> ls -> annotate test ->
    annotate -f -> al -> scrape -> del_template -> EOF, with the store
    reloaded per command and saved after each mutation."""
    page = tmp_path / "page.html"
    page.write_text("<html><body><h1>Walnut Desk</h1>"
                    "<p>solid walnut, oiled</p>"
                    "<span>USD 129</span></body></html>")
    page2 = tmp_path / "page2.html"
    page2.write_text("<html><body><h1>Oak Table</h1>"
                     "<p>solid oak, waxed</p>"
                     "<span>USD 240</span></body></html>")
    store = str(tmp_path / "store.json")

    script = "\n".join([
        "add_template %s" % page,
        "ls",
        "a 0 Walnut Desk",            # test mode: show the match
        "a 0 Walnut Desk -f name",    # annotate
        "a 0 USD 129 -f price",
        "al 0",
        "s %s" % page2,
        "td 1",                        # not found
        "ls_templates",
    ]) + "\n"
    out = subprocess.run(
        [sys.executable, "-m", "scrapely_spark.tool", store],
        input=script, capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    stdout = out.stdout
    assert "scrapely> " in stdout                      # the REPL prompt
    assert "[0] file://%s" % page in stdout            # add_template echo
    assert "[0] '<h1>Walnut Desk</h1>'" in stdout      # annotate test mode
    assert "[new] (name) '<h1>Walnut Desk</h1>'" in stdout
    assert "[new] (price) '<span>USD 129</span>'" in stdout
    assert "[0-0] (name) '<h1>Walnut Desk</h1>'" in stdout   # ls_annotations
    assert "[0-1] (price) '<span>USD 129</span>'" in stdout
    assert "Oak Table" in stdout and "USD 240" in stdout  # scrape result
    assert "template not found: 1" in stdout

    # mutations persisted through the shared store format
    with open(store) as fh:
        tpls = json.load(fh)["templates"]
    assert len(tpls) == 1 and "data-scrapy-annotate" in tpls[0]["body"]

    # one-shot CLI and the shell interoperate on the same store
    out = subprocess.run(
        [sys.executable, "-m", "scrapely_spark.tool", store, "al", "0"],
        capture_output=True, text=True, cwd="/root/repo")
    assert "(name)" in out.stdout and "(price)" in out.stdout


def test_cli_repl_eof_and_empty_store(tmp_path):
    store = str(tmp_path / "empty.json")
    out = subprocess.run(
        [sys.executable, "-m", "scrapely_spark.tool", store],
        input="ls\ns http://x/\n", capture_output=True, text=True,
        cwd="/root/repo")
    assert out.returncode == 0
    assert "no templates available" in out.stderr      # reference wording


def test_curate_image_captions_boundaries(spark):
    rows = [
        ("a", 64, 64, b"", "one two three"),        # every bound inclusive
        ("b", 63, 200, b"", "one two three"),       # w below floor
        ("c", 200, 100, b"", "one two three"),      # aspect 2.0 inclusive
        ("d", 201, 100, b"", "one two three"),      # aspect 2.01 > max
        ("e", 100, 200, b"", "one two three"),      # aspect 0.5 inclusive
        ("f", 100, 100, b"", "two words"),          # caption below min
        ("g", 100, 100, b"", " ".join(["w"] * 77)),  # 77 tokens inclusive
        ("h", 100, 100, b"", " ".join(["w"] * 78)),  # over the window
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, bytes binary, caption string")
    got = sorted(r.image_id for r in
                 multimodal.curate_image_captions(df).collect())
    assert got == ["a", "c", "e", "g"]


def test_curation_scan_prunes_bytes(spark, tmp_path):
    # the gate must never read the binary column: at 100 TB the bytes
    # ARE the table, and a metadata-only filter that drags them along
    # is wrong
    p = str(tmp_path / "imgs.parquet")
    spark.createDataFrame(
        [("a", 100, 100, b"\x00" * 64, "tiny caption here")],
        "image_id string, w int, h int, bytes binary, caption string"
    ).write.parquet(p)
    df = multimodal.curate_image_captions(spark.read.parquet(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "bytes" not in read_schema[0]
    assert df.count() == 1


# ------------------------------------------------------ phash_delta_dups

def _ph_rows(ids):
    import hashlib
    rows = []
    for i in ids:
        h = int(hashlib.md5(str(i // 2).encode()).hexdigest()[:16], 16)
        if i % 2:
            h ^= 32          # planted hamming-1 twin
        if h >= 1 << 63:
            h -= 1 << 64     # two's-complement into a Spark long
        rows.append(("img%04d" % i, h))
    return rows


def test_phash_delta_equals_batch_union(spark):
    old_ids, new_ids = list(range(0, 41)), list(range(41, 60))
    old = spark.createDataFrame(_ph_rows(old_ids),
                                "image_id string, phash long")
    new = spark.createDataFrame(_ph_rows(new_ids),
                                "image_id string, phash long")
    both = spark.createDataFrame(_ph_rows(old_ids + new_ids),
                                 "image_id string, phash long")
    full = {(r.id_a, r.id_b, r.hamming)
            for r in multimodal.phash_near_dups(both, 3).collect()}
    old_pairs = {(r.id_a, r.id_b, r.hamming)
                 for r in multimodal.phash_near_dups(old, 3).collect()}
    delta = multimodal.phash_delta_dups(
        new, multimodal.phash_chunks(old)).collect()
    delta_pairs = {(r.id_a, r.id_b, r.hamming) for r in delta}
    # append-only equivalence: full == old ∪ delta, disjointly
    assert old_pairs | delta_pairs == full
    assert not (old_pairs & delta_pairs)
    # the boundary twin (40, 41) crosses the increment -> vs_index
    vs = {(r.id_a, r.id_b): r.vs_index for r in delta}
    assert vs[("img0040", "img0041")] is True
    # a twin fully inside the batch is discoverable without the index
    assert vs[("img0042", "img0043")] is False


def test_phash_delta_reingestion_no_self_pair(spark):
    ids = list(range(10))
    old = spark.createDataFrame(_ph_rows(ids),
                                "image_id string, phash long")
    # re-ingest the same images: nothing new pairs with itself, and
    # every twin collapses to ONE row preferring vs_index=false is
    # impossible here (the twin is also in the index under the same
    # id), so pairs keep vs_index semantics per arm collapse
    delta = multimodal.phash_delta_dups(
        old, multimodal.phash_chunks(old)).collect()
    assert all(r.id_a != r.id_b for r in delta)
    # twins re-found against the index or within the batch, once each
    pairs = {(r.id_a, r.id_b) for r in delta}
    assert ("img0000", "img0001") in pairs
    assert len(pairs) == len(delta)


# --------------------------------------------------------- caption_spam

def test_caption_spam_normalizes_and_counts_distinct_visuals(spark):
    rows = [
        # "buy now" under 4 visually distinct images, noisy spellings
        # (incl. EDGE tabs/newlines: Spark trim strips only spaces,
        # so the norm must collapse before trimming)
        ("a", 1, "Buy  Now"), ("b", 2, "buy now "), ("c", 3, "BUY\tNOW"),
        ("g", 4, "\tbuy now\n"),
        # same caption but ONE image re-uploaded (same phash): not spam
        ("d", 7, "lake sunset"), ("e", 7, "Lake  Sunset"),
        # unique caption: not spam
        ("f", 9, "a red bicycle"),
    ]
    df = spark.createDataFrame(rows,
                               "image_id string, phash long, "
                               "caption string")
    out = {r.caption_norm: (r.n_images, r.n_distinct_phash)
           for r in multimodal.caption_spam(df, 3).collect()}
    assert out == {"buy now": (4, 4)}


# ---------------------------------------------------- caption_alignment

def test_caption_alignment_scores_and_gates(spark):
    rows = [
        # parallel vectors: cosine 1.0 — passes any gate
        ("p0", [1.0, 2.0, 2.0], [2.0, 4.0, 4.0]),
        # orthogonal: cosine 0.0 — gated out at 0.15
        ("p1", [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        # anti-parallel: cosine -1.0 — gated out
        ("p2", [1.0, 1.0, 0.0], [-1.0, -1.0, 0.0]),
        # 3-4-5 triangle pair: cosine 0.6 exactly
        ("p3", [3.0, 4.0, 0.0], [1.0, 0.0, 0.0]),
        # zero-norm image vector: NULL score, dropped (no div-by-zero)
        ("p4", [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "pair_id string, image_emb array<double>, "
              "caption_emb array<double>")
    out = {r.pair_id: r.align_score
           for r in multimodal.caption_alignment(df).collect()}
    assert out == {"p0": 1.0, "p3": 0.6}
    # the gate is on the ROUNDED score (engine-portable contract)
    strict = multimodal.caption_alignment(df, min_score=0.7).collect()
    assert {r.pair_id for r in strict} == {"p0"}


def test_caption_alignment_keeps_payload_drops_vectors(spark):
    df = spark.createDataFrame(
        [("p0", "cap", [1.0], [1.0])],
        "pair_id string, caption string, image_emb array<double>, "
        "caption_emb array<double>")
    out = multimodal.caption_alignment(df, min_score=0.0)
    assert out.columns == ["pair_id", "caption", "align_score"]


# --------------------------------------------------- image_corpus_build

def test_image_corpus_build_every_leg_bites(spark):
    rows = [
        # a hamming-0 twin pair: one canonical survives, size 2
        (1, 512, 512, "a lake at dawn", 0xABC0),
        (2, 512, 512, "a lake at sunset", 0xABC0),
        # spam caption on 3 visually distinct images: all dropped
        (3, 300, 300, "click to enlarge", 0x111),
        (4, 300, 300, "click to enlarge", 0x222),
        (5, 300, 300, "click to enlarge", 0x333),
        # too small: curation drops it
        (6, 32, 512, "tiny thumbnail image", 0x444),
        # caption too short (< 3 tokens): curation drops it
        (7, 512, 512, "cat", 0x555),
        # clean singleton: survives as its own cluster
        (8, 800, 400, "a wide mountain panorama", 0x666),
    ]
    df = spark.createDataFrame(
        rows, "image_id long, w int, h int, caption string, phash long")
    out = {r.image_id: r for r in
           multimodal.image_corpus_build(df).collect()}
    assert set(out) == {1, 8}
    assert out[1].cluster_size == 2
    assert out[8].cluster_size == 1
    assert out[8].bucket == "2:1" and out[8].target_w == 1472
    assert out[1].caption == "a lake at dawn"


# ------------------------------------------------------------- EXIF

def test_exif_roundtrip_and_junk(spark):
    from scrapely_spark.spark import multimodal
    from scrapely_spark.spark.codec import exif_bytes
    rows = [
        (1, exif_bytes(1, "2024:01:02 03:04:05", "CamA")),
        (2, exif_bytes(8, "2020:12:31 23:59:59", "Cam B Corp")),
        (3, b"not exif at all"),
        (4, b""),
    ]
    df = spark.createDataFrame(rows, "image_id long, exif binary")
    got = {r.image_id: (r.orientation, r.taken_at, r.make, r.exif_valid)
           for r in multimodal.exif_extract(df).collect()}
    assert got[1] == (1, "2024:01:02 03:04:05", "CamA", True)
    assert got[2] == (8, "2020:12:31 23:59:59", "Cam B Corp", True)
    assert got[3] == (None, None, None, False)
    assert got[4] == (None, None, None, False)


def test_exif_parser_tolerates_unknown_tags():
    import struct
    from scrapely_spark.spark.codec import (exif_bytes, exif_meta,
                                            _TIFF_II)
    # hand-build an IFD with an extra unknown tag before orientation
    ifd = struct.pack("<H", 2)
    ifd += struct.pack("<HHII", 999, 3, 1, 7)      # unknown: skipped
    ifd += struct.pack("<HHII", 274, 3, 1, 5)      # orientation 5
    ifd += struct.pack("<I", 0)
    blob = _TIFF_II + struct.pack("<I", 8) + ifd
    assert exif_meta(blob) == (5, None, None, True)
    # truncated out-of-line ASCII -> invalid, not a crash
    good = exif_bytes(3, "2024:01:01 00:00:00", "X")
    assert exif_meta(good[:-5])[3] is False


def test_sniff_format_magic_table(spark):
    # one real header per format, plus truncation/garbage/mislabels
    cases = [
        ("jpg-ok",   "jpeg", bytes.fromhex("FFD8FFE000104A46494600") + b"x"),
        ("png-ok",   "png",  bytes.fromhex("89504E470D0A1A0A") + b"IHDR"),
        ("gif87",    "gif",  b"GIF87a" + b"\x01\x00"),
        ("gif89",    "gif",  b"GIF89a" + b"\x01\x00"),
        ("tiff-le",  "tiff", b"II*\x00" + b"\x08\x00\x00\x00"),
        ("tiff-be",  "tiff", b"MM\x00*" + b"\x00\x00\x00\x08"),
        ("webp-ok",  "webp", b"RIFF\x24\x00\x00\x00WEBPVP8 "),
        ("bmp-ok",   "bmp",  b"BM" + b"\x36\x00\x00\x00"),
        # RIFF without the WEBP FourCC (a WAV) must NOT sniff as webp
        ("wav",      "webp", b"RIFF\x24\x00\x00\x00WAVEfmt "),
        # declared png, actual jpeg: the mislabel the gate exists for
        ("mislabel", "png",  bytes.fromhex("FFD8FFE1") + b"Exif"),
        ("garbage",  "jpeg", b"\xde\xad\xbe\xef\x00\x00"),
        ("tiny",     "png",  b"\x89P"),  # truncated before the magic ends
    ]
    df = spark.createDataFrame(
        [(i, f, bytearray(b)) for i, f, b in cases],
        "image_id string, fmt string, bytes binary")
    got = {r.image_id: r for r in multimodal.sniff_format(df).collect()}
    want = {"jpg-ok": "jpeg", "png-ok": "png", "gif87": "gif",
            "gif89": "gif", "tiff-le": "tiff", "tiff-be": "tiff",
            "webp-ok": "webp", "bmp-ok": "bmp", "wav": "unknown",
            "mislabel": "jpeg", "garbage": "unknown", "tiny": "unknown"}
    for iid, fmt, blob in cases:
        r = got[iid]
        assert r.sniffed_fmt == want[iid], iid
        assert r.n_bytes == len(blob)
        assert r.fmt_ok == (r.declared_fmt == r.sniffed_fmt)
    ok = [i for i, r in got.items() if r.fmt_ok]
    assert sorted(ok) == ["bmp-ok", "gif87", "gif89", "jpg-ok",
                          "png-ok", "tiff-be", "tiff-le", "webp-ok"]


def test_size_gate_each_flag_bites(spark):
    rows = [
        # 1000x800 jpeg, raw=2.4MB: plausible at 48KB (ratio 50)
        ("ok",        "jpeg", 1000, 800, 48_000),
        # same image but 8KB -> ratio 300 > jpeg's 100: truncated
        ("trunc",     "jpeg", 1000, 800, 8_000),
        # bmp is uncompressed: even ratio 3 is implausible
        ("bmp-trunc", "bmp",  100,  100, 10_000),
        ("bmp-ok",    "bmp",  100,  100, 30_100),
        # 36 MP: decode bomb regardless of byte size
        ("bomb",      "png",  6000, 6000, 50_000_000),
        # sub-header stub
        ("stub",      "png",  64,   64,  50),
        # unknown container: most permissive ratio, never truncated
        # here (raw 12288, 12288 <= 150*100)
        ("mystery",   "heic", 64,   64,  100),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, fmt string, w int, h int, n_bytes long")
    got = {r.image_id: r for r in multimodal.size_gate(df).collect()}
    assert got["ok"].keep
    assert got["trunc"].truncated and not got["trunc"].keep
    assert got["bmp-trunc"].truncated
    assert got["bmp-ok"].keep
    assert got["bomb"].bomb and not got["bomb"].keep
    assert got["stub"].too_small
    assert got["mystery"].keep


def test_size_gate_falls_back_to_blob_length(spark):
    df = spark.createDataFrame(
        [("a", "png", 8, 8, bytearray(b"\x00" * 300))],
        "image_id string, fmt string, w int, h int, bytes binary")
    r = multimodal.size_gate(df).collect()[0]
    assert r.n_bytes == 300 and r.keep  # raw 192 < 300*50


def test_ingest_gates_equals_piecewise_gates(spark):
    # the fused verdict must equal sniff_format.fmt_ok AND
    # size_gate.keep computed piecewise on the same rows
    rows = [
        ("ok",    "jpeg", bytes.fromhex("FFD8FFE000104A46494600"),
         800, 600, 40_000),
        ("badfmt", "png", bytes.fromhex("FFD8FFE000104A46494600"),
         800, 600, 40_000),
        ("trunc", "jpeg", bytes.fromhex("FFD8FFE000104A46494600"),
         800, 600, 2_000),
        ("bomb",  "png",  bytes.fromhex("89504E470D0A1A0A"),
         6000, 6000, 1_000_000),
    ]
    df = spark.createDataFrame(
        [(i, f, bytearray(b), w, h, n) for i, f, b, w, h, n in rows],
        "image_id string, fmt string, bytes binary, w int, h int,"
        " n_bytes long")
    fused = {r.image_id: r for r in multimodal.ingest_gates(df).collect()}
    sniff = {r.image_id: r.fmt_ok
             for r in multimodal.sniff_format(df).collect()}
    size = {r.image_id: r.keep
            for r in multimodal.size_gate(df).collect()}
    for iid in sniff:
        assert fused[iid].keep == (sniff[iid] and size[iid]), iid
    assert fused["ok"].keep
    assert not fused["badfmt"].keep and not fused["badfmt"].fmt_ok
    assert fused["trunc"].truncated and fused["bomb"].bomb


def test_caption_lang_gate_agreement_and_mismatch(spark):
    rows = [
        ("a", "en", "the cat and the dog sat in the sun"),
        ("b", "de", "der hund und die katze von mit"),
        # declared en but caption is german: metadata lie caught
        ("c", "en", "der die und von mit der die und"),
        # zero marker hits anywhere: tie resolves to 'de'
        ("d", "fr", "zzz qqq www"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, declared_lang string, caption string")
    got = {r.image_id: r for r in
           multimodal.caption_lang_gate(df).collect()}
    assert got["a"].lang_ok and got["a"].detected_lang == "en"
    assert got["b"].lang_ok and got["b"].detected_lang == "de"
    assert not got["c"].lang_ok and got["c"].detected_lang == "de"
    assert got["d"].detected_lang == "de" and got["d"].marker_hits == 0


def test_caption_lang_gate_same_model_as_text_langid(spark):
    # a caption and a document with identical text must land in the
    # same language — the gate reuses language_id, not a twin of it
    from scrapely_spark.spark import textstats
    text = "le chat et les des la"
    cap = spark.createDataFrame(
        [("x", "fr", text)],
        "image_id string, declared_lang string, caption string")
    doc = spark.createDataFrame(
        [(0, "fr", text)], "doc_id long, lang string, text string")
    g = multimodal.caption_lang_gate(cap).collect()[0]
    d = textstats.language_id(doc).collect()[0]
    assert g.detected_lang == d.predicted_lang
    assert g.marker_hits == d.score


def test_exact_image_dedup_groups_and_election(spark):
    blobs = {0: b"\x01\x02", 1: b"\x01\x02", 2: b"zz", 3: b"\x01\x02"}
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in blobs.items()],
        "image_id long, bytes binary")
    got = {r.image_id: r for r in
           multimodal.exact_image_dedup(df).collect()}
    assert got[0].is_canonical and got[0].group_size == 3
    assert got[1].canonical_id == 0 and not got[1].is_canonical
    assert got[3].canonical_id == 0
    assert got[2].is_canonical and got[2].group_size == 1
    assert got[0].content_sha == got[1].content_sha != got[2].content_sha


def test_exact_image_dedup_null_payloads_stay_singletons(spark):
    # failed/empty downloads (bytes NULL) have no content to match:
    # each stays its own canonical singleton instead of the NULL hash
    # electing one winner and dropping the rest
    df = spark.createDataFrame(
        [(0, bytearray(b"\x01")), (1, None), (2, None),
         (3, bytearray(b"\x01"))],
        "image_id long, bytes binary")
    got = {r.image_id: r for r in
           multimodal.exact_image_dedup(df).collect()}
    assert got[1].is_canonical and got[1].group_size == 1
    assert got[2].is_canonical and got[2].group_size == 1
    assert got[1].canonical_id == 1 and got[2].canonical_id == 2
    assert got[1].content_sha is None
    assert got[0].group_size == 2 and got[3].canonical_id == 0


def _png_bytes(w, h):
    import struct
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00")


def _gif_bytes(w, h):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x00"


def _bmp_bytes(w, h):
    import struct
    return (b"BM" + struct.pack("<IHHI", 1000, 0, 0, 54)
            + struct.pack("<Iii", 40, w, h) + b"\x00" * 8)


def test_header_dims_parses_and_validates(spark):
    rows = [
        ("png_ok", _png_bytes(640, 480), 640, 480),
        ("png_bad", _png_bytes(641, 480), 640, 480),
        ("gif_ok", _gif_bytes(320, 200), 320, 200),
        ("gif_bad", _gif_bytes(320, 201), 320, 200),
        ("bmp_ok", _bmp_bytes(800, 600), 800, 600),
        # top-down DIB: negative biHeight, magnitude is the height
        ("bmp_topdown", _bmp_bytes(800, -600), 800, 600),
        ("png_trunc", _png_bytes(640, 480)[:12], 640, 480),
        ("jpeg", b"\xff\xd8\xff\xe0" + b"\x00" * 20, 100, 100),
        ("junk", b"\xde\xad\xbe\xef" + b"\x00" * 20, 100, 100),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, "
                                     "w int, h int")
    out = {r["image_id"]: r for r in
           multimodal.header_dims(df).collect()}

    assert out["png_ok"]["status"] == "ok"
    assert (out["png_ok"]["actual_w"], out["png_ok"]["actual_h"]) \
        == (640, 480)
    assert out["png_bad"]["status"] == "mismatch"
    assert out["png_bad"]["actual_w"] == 641
    assert out["gif_ok"]["status"] == "ok"
    assert out["gif_bad"]["status"] == "mismatch"
    assert out["bmp_ok"]["status"] == "ok"
    assert out["bmp_topdown"]["status"] == "ok"
    assert out["bmp_topdown"]["actual_h"] == 600
    assert out["png_trunc"]["status"] == "truncated"
    assert out["png_trunc"]["actual_w"] is None
    assert out["jpeg"]["status"] == "unsupported"
    assert out["junk"]["status"] == "unsupported"
    assert out["png_ok"]["dims_ok"] is True
    assert out["png_bad"]["dims_ok"] is False
    assert out["jpeg"]["dims_ok"] is None


def test_header_dims_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [("a", _png_bytes(2, 3), 2, 3)],
        "image_id string, bytes binary, w int, h int")
    plan = multimodal.header_dims(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def _jpeg_bytes(w, h, prog=False, pad=0, com=False, fill=False):
    import struct
    b = b"\xff\xd8"
    app0 = b"JFIF\x00" + b"\x00" * (9 + pad)
    b += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    if com:
        b += b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    if fill:
        b += b"\xff"
    b += (b"\xff" + (b"\xc2" if prog else b"\xc0")
          + struct.pack(">H", 17) + b"\x08"
          + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9)
    return b


def test_jpeg_sof_walker_edge_cases():
    from scrapely_spark.spark.codec import jpeg_sof

    assert jpeg_sof(_jpeg_bytes(640, 480)) == (640, 480, False, 3, True)
    # variable APP0 padding, COM segment, fill byte, progressive
    assert jpeg_sof(_jpeg_bytes(31, 7, prog=True, pad=7, com=True,
                                fill=True)) == (31, 7, True, 3, True)
    # RSTn standalone marker mid-stream is skipped without a length
    good = _jpeg_bytes(10, 20)
    with_rst = good[:2] + b"\xff\xd0" + good[2:]
    assert jpeg_sof(with_rst) == (10, 20, False, 3, True)
    inv = (None, None, None, None, False)
    assert jpeg_sof(b"") == inv
    assert jpeg_sof(b"\xde\xad\xbe\xef") == inv
    assert jpeg_sof(good[:9]) == inv                 # truncated mid-APP0
    assert jpeg_sof(b"\xff\xd8\xff\xd9") == inv      # EOI before SOF
    # segment length overrunning the payload must not read past it
    assert jpeg_sof(b"\xff\xd8\xff\xe0\xff\xff") == inv
    # SOS before SOF: dims unrecoverable without entropy decode
    assert jpeg_sof(b"\xff\xd8\xff\xda\x00\x04\x00\x00") == inv


def test_jpeg_dims_kernel_over_spark(spark):
    from scrapely_spark.spark import multimodal

    rows = [("a", _jpeg_bytes(100, 50)),
            ("b", _jpeg_bytes(7, 9, prog=True)),
            ("c", b"\x00junk")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = {r["image_id"]: r for r in multimodal.jpeg_dims(df).collect()}
    assert (out["a"]["jpeg_w"], out["a"]["jpeg_h"]) == (100, 50)
    assert out["a"]["progressive"] is False
    assert out["b"]["progressive"] is True
    assert out["c"]["jpeg_valid"] is False
    assert out["c"]["jpeg_w"] is None


def test_gps_codec_exact_and_scrub_identity():
    from scrapely_spark.spark.codec import (exif_bytes, exif_bytes_gps,
                                            exif_gps, exif_gps_scrub,
                                            exif_meta)

    for lat, lon in [(37774929, -122419418), (-33868820, 151209290),
                     (0, 0), (89999999, 179999999),
                     (-90000000, -180000000)]:
        b = exif_bytes_gps(6, "2024:05:01 10:00:00", "CamX", lat, lon)
        assert exif_gps(b) == (lat, lon, True, True)
        s = exif_gps_scrub(b)
        # GPS gone, benign metadata intact
        assert exif_gps(s) == (None, None, False, True)
        assert exif_meta(s) == (6, "2024:05:01 10:00:00", "CamX", True)
        # no carveable remnant: the scrubbed blob is strictly smaller
        # and contains neither the sub-IFD nor the rational payloads
        assert len(s) < len(b)
        assert s not in (None, b)

    # a blob that never had GPS round-trips BYTE-IDENTICALLY — the
    # re-serializer is canonical w.r.t. our writer's layout
    plain = exif_bytes(3, "2024:01:02 03:00:00", "Cam1")
    assert exif_gps_scrub(plain) == plain
    assert exif_gps(plain) == (None, None, False, True)

    # junk never raises and never passes through
    assert exif_gps(b"\x00" * 20) == (None, None, False, False)
    assert exif_gps_scrub(b"junk") is None


def test_gps_scrub_kernel_over_spark(spark):
    from scrapely_spark.spark import multimodal
    from scrapely_spark.spark.codec import (exif_bytes, exif_bytes_gps,
                                            exif_gps)

    rows = [
        (1, exif_bytes_gps(1, "2024:01:01 00:00:00", "A",
                           48858370, 2294481)),       # Eiffel Tower
        (2, exif_bytes_gps(2, "2024:01:02 00:00:00", "B",
                           -22951916, -43210487)),    # Rio, S/W refs
        (3, exif_bytes(3, "2024:01:03 00:00:00", "C")),  # no GPS
        (4, b"garbage bytes"),
    ]
    df = spark.createDataFrame(rows, "image_id int, exif binary")
    out = {r["image_id"]: r
           for r in multimodal.gps_scrub(df).collect()}

    assert out[1]["had_gps"] is True
    assert out[1]["lat_e6"] == 48858370
    assert out[1]["lon_e6"] == 2294481
    assert exif_gps(bytes(out[1]["exif"])) == (None, None, False, True)
    assert out[2]["lat_e6"] == -22951916
    assert out[2]["lon_e6"] == -43210487
    assert out[3]["had_gps"] is False
    assert out[3]["lat_e6"] is None
    assert bytes(out[3]["exif"]) == rows[2][1]   # untouched blob
    assert out[4]["exif_valid"] is False
    assert out[4]["exif"] is None                # junk never passes


def test_webp_walker_edge_cases():
    from scrapely_spark.spark.codec import webp_bytes, webp_features

    # all three chunk kinds, alpha variants, 14-bit extremes
    assert webp_features(webp_bytes(800, 600, "vp8")) \
        == (800, 600, "vp8", False, True)
    assert webp_features(webp_bytes(16383, 1, "vp8")) \
        == (16383, 1, "vp8", False, True)
    assert webp_features(webp_bytes(33, 77, "vp8l", alpha=True)) \
        == (33, 77, "vp8l", True, True)
    # vp8x carries 24-bit canvas dims — beyond the 14-bit bitstreams
    assert webp_features(webp_bytes(100000, 65536, "vp8x")) \
        == (100000, 65536, "vp8x", False, True)
    assert webp_features(webp_bytes(2, 2, "vp8x", alpha=True))[3] \
        is True

    inv = (None, None, None, None, False)
    assert webp_features(b"") == inv
    assert webp_features(b"RIFFxxxxWEBP") == inv          # truncated
    assert webp_features(webp_bytes(8, 8, "vp8")[:14]) == inv
    broken = bytearray(webp_bytes(8, 8, "vp8"))
    broken[23] = 0                                        # start code
    assert webp_features(bytes(broken)) == inv
    badsig = bytearray(webp_bytes(8, 8, "vp8l"))
    badsig[20] = 0x30                                     # not 0x2F
    assert webp_features(bytes(badsig)) == inv
    # nonzero VP8L version bits are reserved → invalid
    import struct
    v = (7 << 29) | (7 | (7 << 14))
    payload = b"\x2f" + struct.pack("<I", v)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload + b"\x00"
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert webp_features(blob) == inv


def test_webp_dims_kernel_over_spark(spark):
    from scrapely_spark.spark import multimodal
    from scrapely_spark.spark.codec import webp_bytes

    rows = [
        (1, webp_bytes(640, 480, "vp8")),
        (2, webp_bytes(100, 50, "vp8l", alpha=True)),
        (3, webp_bytes(20000, 30000, "vp8x")),
        (4, b"not webp"),
    ]
    df = spark.createDataFrame(rows, "image_id int, bytes binary")
    out = {r["image_id"]: r
           for r in multimodal.webp_dims(df).collect()}
    assert (out[1]["webp_w"], out[1]["webp_h"]) == (640, 480)
    assert out[1]["webp_kind"] == "vp8"
    assert out[2]["webp_alpha"] is True
    assert out[2]["webp_kind"] == "vp8l"
    assert (out[3]["webp_w"], out[3]["webp_h"]) == (20000, 30000)
    assert out[4]["webp_valid"] is False
    assert out[4]["webp_w"] is None


def test_gif_walker_edge_cases():
    from scrapely_spark.spark.codec import gif_bytes, gif_frames

    assert gif_frames(gif_bytes(320, 200, 1)) \
        == (320, 200, 1, None, True)
    assert gif_frames(gif_bytes(64, 64, 8, loop_count=0)) \
        == (64, 64, 8, 0, True)
    assert gif_frames(gif_bytes(10, 10, 3, loop_count=5)) \
        == (10, 10, 3, 5, True)

    inv = (None, None, None, None, False)
    assert gif_frames(b"") == inv
    assert gif_frames(b"NOTGIF" + b"\x00" * 20) == inv
    assert gif_frames(gif_bytes(10, 10, 3)[:-1]) == inv   # no trailer
    assert gif_frames(gif_bytes(10, 10, 2)[:20]) == inv   # truncated
    # unknown block type aborts instead of miscounting
    blob = bytearray(gif_bytes(10, 10, 1))
    blob[13] = 0x7E
    assert gif_frames(bytes(blob)) == inv


def test_gif_frame_meta_kernel_over_spark(spark):
    from scrapely_spark.spark import multimodal
    from scrapely_spark.spark.codec import gif_bytes

    rows = [
        (1, gif_bytes(100, 80, 1)),
        (2, gif_bytes(64, 64, 12, loop_count=0)),
        (3, gif_bytes(32, 32, 2, loop_count=7)),
        (4, b"junk"),
    ]
    df = spark.createDataFrame(rows, "image_id int, bytes binary")
    out = {r["image_id"]: r
           for r in multimodal.gif_frame_meta(df).collect()}
    assert (out[1]["n_frames"], out[1]["loop_count"]) == (1, None)
    assert (out[2]["n_frames"], out[2]["loop_count"]) == (12, 0)
    assert (out[3]["gif_w"], out[3]["loop_count"]) == (32, 7)
    assert out[4]["gif_valid"] is False


def test_png_walker_edge_cases():
    from scrapely_spark.spark.codec import png_bytes, png_meta

    assert png_meta(png_bytes(640, 480)) \
        == (640, 480, 8, 6, False, 1, True)
    assert png_meta(png_bytes(32, 32, 16, 2, True)) \
        == (32, 32, 16, 2, True, 1, True)
    assert png_meta(png_bytes(10, 10, n_frames=24)) \
        == (10, 10, 8, 6, False, 24, True)

    inv = (None,) * 6 + (False,)
    assert png_meta(b"") == inv
    assert png_meta(b"\x89PNG\r\n\x1a\nJUNKJUNKJUNK" + b"\x00" * 20) \
        == inv
    assert png_meta(png_bytes(10, 10)[:-1]) == inv      # IEND cut
    # a single flipped bit anywhere in a chunk body fails its CRC —
    # corruption can never become silently-wrong dimensions
    bad = bytearray(png_bytes(10, 10))
    bad[20] ^= 1
    assert png_meta(bytes(bad)) == inv


def test_png_chunk_meta_kernel_over_spark(spark):
    from scrapely_spark.spark import multimodal
    from scrapely_spark.spark.codec import png_bytes

    rows = [
        (1, png_bytes(100, 80)),
        (2, png_bytes(64, 64, 16, 0, True)),
        (3, png_bytes(32, 32, n_frames=9)),
        (4, b"junk"),
    ]
    df = spark.createDataFrame(rows, "image_id int, bytes binary")
    out = {r["image_id"]: r
           for r in multimodal.png_chunk_meta(df).collect()}
    assert (out[1]["png_w"], out[1]["n_frames"]) == (100, 1)
    assert (out[2]["bit_depth"], out[2]["interlaced"]) == (16, True)
    assert out[3]["n_frames"] == 9
    assert out[4]["png_valid"] is False


def test_avif_walker_edge_cases():
    import struct

    from scrapely_spark.spark.codec import avif_bytes, avif_dims

    assert avif_dims(avif_bytes(1920, 1080)) \
        == (1920, 1080, "avif", True)
    assert avif_dims(avif_bytes(64, 48, "heic")) \
        == (64, 48, "heic", True)

    inv = (None, None, None, False)
    assert avif_dims(b"") == inv
    assert avif_dims(b"\x00\x00\x00\x10ftypavif\x00\x00\x00\x00") \
        == inv                                   # ftyp only, no ispe
    assert avif_dims(avif_bytes(10, 10)[:30]) == inv   # truncated
    # hostile sizes: overrun and zero-size must neither crash nor loop
    evil = bytearray(avif_bytes(10, 10))
    struct.pack_into(">I", evil, 20, 0xFFFFFFF0)
    assert avif_dims(bytes(evil)) == inv
    evil2 = bytearray(avif_bytes(10, 10))
    struct.pack_into(">I", evil2, 20, 0)
    assert avif_dims(bytes(evil2)) == inv


def test_avif_dims_kernel_over_spark(spark):
    from scrapely_spark.spark import multimodal
    from scrapely_spark.spark.codec import avif_bytes

    rows = [
        (1, avif_bytes(3840, 2160)),
        (2, avif_bytes(16, 16, "heic")),
        (3, b"garbage"),
    ]
    df = spark.createDataFrame(rows, "image_id int, bytes binary")
    out = {r["image_id"]: r
           for r in multimodal.avif_header_dims(df).collect()}
    assert (out[1]["avif_w"], out[1]["brand"]) == (3840, "avif")
    assert out[2]["brand"] == "heic"
    assert out[3]["avif_valid"] is False


def test_image_dims_router_all_formats(spark):
    import struct

    from scrapely_spark.spark import multimodal
    from scrapely_spark.spark.codec import (avif_bytes, gif_bytes,
                                            png_bytes, webp_bytes)

    jpeg = bytes.fromhex(
        "FFD8"                            # SOI
        "FFE000104A46494600" + "00" * 9   # APP0
        + "FFC000110801E00280 03 000000 000000 000000".replace(" ", ""))
    bmp = (b"BM" + b"\x00" * 12
           + struct.pack("<Iii", 40, 321, -123) + b"\x00" * 4)
    bmp_core = (b"BM" + b"\x00" * 12          # OS/2 BITMAPCOREHEADER:
                + struct.pack("<IHHHH",       # u16 dims — an i32 read
                              12, 321, 123, 1, 24))  # would be garbage
    bmp_negw = (b"BM" + b"\x00" * 12
                + struct.pack("<Iii", 40, -321, 123) + b"\x00" * 4)
    rows = [
        (1, jpeg),
        (2, png_bytes(50, 60, n_frames=4)),
        (3, gif_bytes(70, 80, 3, loop_count=0)),
        (4, webp_bytes(90, 100, "vp8l", alpha=True)),
        (5, avif_bytes(110, 120, "heic")),
        (6, bmp),
        (7, b"total junk"),
        (8, gif_bytes(10, 10, 2)[:15]),   # right magic, broken walk
        (9, bmp_core),
        (10, bmp_negw),
    ]
    df = spark.createDataFrame(rows, "image_id int, bytes binary")
    out = {r["image_id"]: r
           for r in multimodal.image_dims_router(df).collect()}
    assert (out[1]["fmt"], out[1]["w"], out[1]["h"]) \
        == ("jpeg", 640, 480)
    assert (out[2]["fmt"], out[2]["n_frames"]) == ("png", 4)
    assert (out[3]["fmt"], out[3]["n_frames"]) == ("gif", 3)
    assert (out[4]["fmt"], out[4]["w"]) == ("webp", 90)
    assert (out[5]["fmt"], out[5]["h"]) == ("heic", 120)
    assert (out[6]["fmt"], out[6]["w"], out[6]["h"]) \
        == ("bmp", 321, 123)              # top-down height folded
    assert out[7]["fmt"] is None
    assert out[7]["dims_valid"] is False
    assert out[8]["fmt"] == "gif"
    assert out[8]["dims_valid"] is False
    # non-INFO DIB headers and malformed widths sniff as bmp but must
    # never return garbage dims as valid
    assert (out[9]["fmt"], out[9]["w"], out[9]["dims_valid"]) \
        == ("bmp", None, False)
    assert (out[10]["fmt"], out[10]["w"], out[10]["dims_valid"]) \
        == ("bmp", None, False)


def test_container_walks_null_bytes_rows(spark):
    """A failed fetch leaves NULL in the binary column; every walk
    operator must flag the row, never crash the executor."""
    from scrapely_spark.spark import multimodal

    df = spark.createDataFrame(
        [(1, None)], "image_id int, bytes binary")
    for op, flag in ((multimodal.webp_dims, "webp_valid"),
                     (multimodal.gif_frame_meta, "gif_valid"),
                     (multimodal.png_chunk_meta, "png_valid"),
                     (multimodal.avif_header_dims, "avif_valid"),
                     (multimodal.image_dims_router, "dims_valid")):
        row = op(df).collect()[0]
        assert row[flag] is False, op.__name__
    gdf = spark.createDataFrame(
        [(1, None)], "image_id int, exif binary")
    row = multimodal.gps_scrub(gdf).collect()[0]
    assert row["exif_valid"] is False
    assert row["exif"] is None


def test_gps_scrub_drops_unrelocatable_subifd_pointers():
    """An Exif-IFD pointer (tag 34665) copied verbatim over a shifted
    layout would dangle — the scrubber must drop it, and the output
    must stay a valid blob with the scalar metadata intact."""
    import struct

    from scrapely_spark.spark.codec import (exif_bytes_gps,
                                            exif_gps, exif_gps_scrub,
                                            exif_meta)

    # hand-built IFD0: inline Make, Orientation, out-of-line
    # DateTime, and an ExifIFD pointer (tag 34665) — the entry the
    # generic re-serializer cannot relocate
    dt_b = b"2024:03:01 09:00:00\x00"
    head = 8 + 2 + 4 * 12 + 4          # dt data lands at 62
    ifd = struct.pack("<H", 4)
    ifd += struct.pack("<HHI", 271, 2, 2) + b"C\x00\x00\x00"
    ifd += struct.pack("<HHII", 274, 3, 1, 5)
    ifd += struct.pack("<HHII", 306, 2, len(dt_b), head)
    ifd += struct.pack("<HHII", 34665, 4, 1, 9999)
    ifd += struct.pack("<I", 0)
    blob = b"II*\x00" + struct.pack("<I", 8) + ifd + dt_b
    assert exif_meta(blob) == (5, "2024:03:01 09:00:00", "C", True)
    s = exif_gps_scrub(blob)
    assert s is not None
    assert exif_gps(s) == (None, None, False, True)
    assert exif_meta(s) == (5, "2024:03:01 09:00:00", "C", True)
    assert struct.pack("<HH", 34665, 4) not in s   # pointer gone
    # and the GPS variant still loses both GPS and the pointer class
    g = exif_bytes_gps(5, "2024:03:01 09:00:00", "CamZ",
                       1_000_000, 2_000_000)
    sg = exif_gps_scrub(g)
    assert exif_gps(sg) == (None, None, False, True)
    assert exif_meta(sg) == (5, "2024:03:01 09:00:00", "CamZ", True)


def test_video_near_dups_aligned_frames(spark):
    from scrapely_spark.spark import multimodal

    base = {0: 0x123456789ABCD, 1: 0x0FEDCBA987654, 2: 0x5A5A5A5A5A5A5}
    rows = []
    # v1 = canonical; v2 = 1-bit drift per frame (re-encode); v3 =
    # heavy damage on frames 0+1, exact frame 2 (one matching frame
    # only — below min_match_frames); v4 unrelated
    for f, h in base.items():
        rows += [(1, f, h), (2, f, h ^ 1), (3, f, h ^ 0x00FFFF00
                                            if f < 2 else h),
                 (4, f, h ^ 0x7777777777777)]
    df = spark.createDataFrame(
        rows, "video_id int, frame_idx int, phash long")
    out = {(r["va"], r["vb"]): r
           for r in multimodal.video_near_dups(df).collect()}
    assert set(out) == {(1, 2)}
    assert out[(1, 2)]["n_matching_frames"] == 3
    assert out[(1, 2)]["best_hamming"] == 1

    # a shared title card (identical frame 0 everywhere) must not
    # pair unrelated videos on its own
    rows2 = [(v, 0, 0xAAAA) for v in (10, 11, 12)]
    far = {10: 0x0F0F0F0F0F0F, 11: 0x3C3C3C3C3C3C,
           12: 0x555555555555}
    rows2 += [(v, 1, far[v]) for v in (10, 11, 12)]
    df2 = spark.createDataFrame(
        rows2, "video_id int, frame_idx int, phash long")
    assert multimodal.video_near_dups(df2).count() == 0


def test_caption_safety_gate(spark):
    from scrapely_spark.spark import multimodal

    rows = [
        (1, "a sunny beach photo"),
        (2, "EXPLICIT content warning"),          # drop category, cased
        (3, "war documentary with gore footage"), # review category
        (4, "gore and a slur together"),          # drop beats review
        # word boundary: substrings must not fire
        (5, "the goretex jacket classification"),
        (6, "nsfw nsfw xxx"),                     # counted per hit
    ]
    df = spark.createDataFrame(rows, "image_id int, caption string")
    out = {r["image_id"]: r
           for r in multimodal.caption_safety_gate(df).collect()}
    assert out[1]["safety_action"] == "keep"
    assert out[2]["safety_action"] == "drop"
    assert out[3]["safety_action"] == "review"
    assert out[3]["n_violence"] == 1
    assert out[4]["safety_action"] == "drop"
    assert out[5]["safety_action"] == "keep"
    assert out[5]["n_violence"] == 0
    assert out[6]["n_adult"] == 3

    plan = multimodal.caption_safety_gate(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_sniff_format_isobmff_brands(spark):
    # ISOBMFF 'ftyp' detection: AVIF/HEIC brands resolve to their
    # family, unknown brands still report the container, and a
    # payload with 'ftyp' NOT at offset 4 stays unknown
    ftyp = lambda brand: (b"\x00\x00\x00\x20ftyp" + brand
                          + b"\x00" * 12)
    cases = [
        ("avif", "avif", ftyp(b"avif")),
        ("avis", "avif", ftyp(b"avis")),
        ("heic", "heic", ftyp(b"heic")),
        ("mif1", "heic", ftyp(b"mif1")),
        ("qt",   "avif", ftyp(b"qt  ")),      # unknown brand
        ("off",  "avif", b"ftypavif" + b"\x00" * 12),  # wrong offset
        # a leading magic still wins over a crafted interior ftyp
        ("bmp",  "bmp",  b"BM\x00\x00ftypavif" + b"\x00" * 8),
    ]
    df = spark.createDataFrame(
        [(i, f, bytearray(b)) for i, f, b in cases],
        "image_id string, fmt string, bytes binary")
    got = {r.image_id: r.sniffed_fmt
           for r in multimodal.sniff_format(df).collect()}
    assert got == {"avif": "avif", "avis": "avif", "heic": "heic",
                   "mif1": "heic", "qt": "isobmff", "off": "unknown",
                   "bmp": "bmp"}


def test_header_dims_bmp_core_header_unsupported(spark):
    # BITMAPCOREHEADER (DIB size 12, u16 dims) must NOT be read
    # through the i32 INFO path — garbage dims with status ok/mismatch
    import struct
    core = (b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
            + struct.pack("<IHH", 12, 100, 200))
    trunc = b"BM" + b"\x00" * 10  # too short to carry the DIB size
    df = spark.createDataFrame(
        [("core", bytearray(core), 100, 200),
         ("trunc", bytearray(trunc), 100, 200)],
        "image_id string, bytes binary, w int, h int")
    out = {r["image_id"]: r for r in
           multimodal.header_dims(df).collect()}
    assert out["core"]["status"] == "unsupported"
    assert out["core"]["actual_w"] is None
    assert out["trunc"]["status"] == "truncated"


def test_exact_image_dedup_empty_payloads_stay_singletons(spark):
    # zero-byte (non-NULL) failed downloads carry no content either:
    # sha2('') must not elect one winner over unrelated rows
    df = spark.createDataFrame(
        [(0, bytearray(b"\x01")), (1, bytearray(b"")),
         (2, bytearray(b"")), (3, bytearray(b"\x01"))],
        "image_id long, bytes binary")
    got = {r.image_id: r for r in
           multimodal.exact_image_dedup(df).collect()}
    assert got[1].is_canonical and got[1].group_size == 1
    assert got[2].is_canonical and got[2].group_size == 1
    assert got[1].content_sha is None and got[2].content_sha is None
    assert got[0].group_size == 2 and got[3].canonical_id == 0


def test_average_hash_small_images_not_constant():
    # sub-8px decodes used to NaN-poison the cell means into hash 0,
    # pairing every favicon with every other at hamming 0
    import numpy as np

    from scrapely_spark.spark import codec as c
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
    b = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
    ha, hb = c.average_hash(a), c.average_hash(b)
    assert ha != hb
    assert c.average_hash(np.zeros((0, 5, 3), dtype=np.uint8)) == 0


def test_jpeg_dims_null_bytes_row(spark):
    # NULL blob reaches the jpeg walk: flagged invalid, never a raise
    df = spark.createDataFrame(
        [(1, None)], "image_id int, bytes binary")
    row = multimodal.jpeg_dims(df).collect()[0]
    assert row["jpeg_valid"] is False
    assert row["jpeg_w"] is None


def test_decode_stats_null_phash_row(spark):
    # a null phash in the batch must neither crash (NaN int()) nor
    # corrupt the other rows' 64-bit comparisons (float64 coercion)
    from pyspark.sql import functions as F

    images = datagen.images_df(spark, 8)
    null_id = "img-%08d" % 0
    with_null = images.withColumn(
        "phash", F.when(F.col("image_id") != null_id, F.col("phash")))
    rows = {r.image_id: r
            for r in multimodal.decode_stats(with_null).collect()}
    assert len(rows) == 8
    for iid, r in rows.items():
        if r.fmt == "png":
            if iid == null_id:
                assert r.phash_match is None
            else:
                assert r.phash_match


def test_frame_phashes_composition_with_video_near_dups(spark):
    # the documented pipeline frame_sample -> frame_phashes ->
    # video_near_dups must type-check and pair a byte-identical
    # re-upload with its original (lossless frames -> hamming 0)
    rows = []
    for vid in ("v1", "v2"):
        frames = codec.frames_for(vid, 24, 18, 5)
        blob = bytearray(codec.encode_video(frames, "png"))
        rows += [(vid, blob), (vid + "-copy", blob)]
    videos = spark.createDataFrame(rows,
                                   "video_id string, bytes binary")
    sampled = multimodal.frame_sample(videos, every_n=2)  # 0, 2, 4
    hashed = multimodal.frame_phashes(sampled)
    assert hashed.columns == ["video_id", "frame_idx", "phash"]
    pairs = {(r.va, r.vb)
             for r in multimodal.video_near_dups(
                 hashed, min_match_frames=2).collect()}
    assert pairs == {("v1", "v1-copy"), ("v2", "v2-copy")}
