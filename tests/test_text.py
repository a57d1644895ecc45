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
