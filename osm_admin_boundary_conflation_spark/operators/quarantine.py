"""Malformed-binary QUARANTINE: parse untrusted container bytes
tolerantly, routing failures to a typed quarantine table instead of
crashing the job.

A 100 TB crawl ingest meets truncated gzip members, torn JPEG scans,
and plain garbage on every run; one bad blob must cost one quarantine
row, never a task retry storm. This operator applies the reference's
typed-error philosophy (reference: processing_state.py:4-27 — every
failure is a named state, not an exception that escapes) to the
engine's from-scratch binary parsers (WARC, JPEG, BMP, WAV):

- sniff the container by magic bytes,
- run the REAL parser (the same code the happy-path gates use),
- map the outcome to a closed reason vocabulary:
    ''               parsed clean
    'unknown_magic'  no known container signature
    'bad_structure'  signature ok, framing violated (our parsers'
                     deliberate ValueErrors: bad version line,
                     Content-Length mismatch, bad marker, non-PCM...)
    'truncated'      bytes end mid-structure (struct/index/zlib/EOF
                     errors from running off the end)
    'parse_error'    catch-all: the parser failed in a way none of the
                     above classify — still one quarantine row, never
                     an escaping exception

The scan is one Arrow-batched mapInPandas pass — per-blob python is
the honest cost of byte-level parsing (same grain as the decode
gates); no exception escapes the batch function, so the plan never
sees a python traceback. Gated by `parser_quarantine` over a
deterministic corrupt corpus (datagen builds valid members of every
format plus truncations, framing violations, and garbage).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def classify_blob(blob: bytes) -> tuple[str, str]:
    """(format, reason) for one untrusted blob; never raises."""
    from ..functions import jpeg_codec as J
    from ..sources import warc as W

    from . import multimodal as M

    blob = bytes(blob)
    if blob[:2] == b"\x1f\x8b":
        fmt, parse = "warc", lambda: _parse_warc_member(W, blob)
    elif blob[:2] == b"BM":
        fmt, parse = "bmp", lambda: M.decode_bmp(blob)
    elif blob[:2] == b"\xff\xd8":
        fmt, parse = "jpeg", lambda: J.decode_jpeg(blob)
    elif blob[:4] == b"RIFF":
        fmt, parse = "wav", lambda: M.decode_wav(blob)
    else:
        return "unknown", "unknown_magic"
    try:
        parse()
        return fmt, ""
    except ValueError:
        return fmt, "bad_structure"
    except (struct.error, IndexError, KeyError, EOFError, zlib.error):
        return fmt, "truncated"
    except Exception:  # noqa: BLE001 — quarantine NEVER lets one escape
        return fmt, "parse_error"


def _parse_warc_member(W, blob: bytes):
    recs = list(W.parse_warc_gz(blob))
    if not recs:
        # all members parsed but none was a response record — fine
        return None
    return recs


def build_corrupt_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic fuzz corpus, one blob per document row, cycling
    through 10 classes by doc_id % 10: valid WARC member / WARC with a
    mangled version line / WARC member cut at 60% of its gzip bytes /
    valid BMP / BMP cut mid-header / valid JPEG / JPEG cut 4 bytes
    short (mid-entropy) / pure garbage with no signature / valid WAV /
    WAV cut mid-fmt-chunk. Every class maps to exactly one
    (format, reason) outcome — pinned empirically across doc_ids and
    asserted by the parser_quarantine oracle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources import warc as W

        from . import multimodal as M

        date = "2024-03-01T00:00:00Z"

        def build(doc_id: int) -> bytes:
            c = doc_id % 10
            html = f"<html><body>doc {doc_id}</body></html>".encode()
            if c in (0, 1, 2):
                rec = W.build_warc_record(f"https://ex.com/{doc_id}", date, html)
                if c == 1:
                    rec = rec.replace(b"WARC/1.0", b"NOPE/1.0")
                m = W.gzip_member(rec)
                return m[: (len(m) * 3) // 5] if c == 2 else m
            if c in (3, 4):
                b = M.build_bmp(doc_id)
                return b[:30] if c == 4 else b
            if c in (5, 6):
                b = M.build_jpeg(doc_id)
                return b[: len(b) - 4] if c == 6 else b
            if c == 7:
                return bytes([doc_id % 251]) * 32
            b = M.build_wav(doc_id)
            return b[:20] if c == 9 else b

        for pdf in it:
            yield pd.DataFrame(
                {
                    "blob_id": pdf["doc_id"].astype("int64"),
                    "payload": [build(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, "blob_id long, payload binary")


def quarantine_scan(df: DataFrame, id_col: str = "blob_id", payload_col: str = "payload") -> DataFrame:
    """(id, format, reason) for every blob; reason '' = clean."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fmts, reasons = [], []
            for b in pdf[payload_col]:
                f, r = classify_blob(b)
                fmts.append(f)
                reasons.append(r)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "format": fmts,
                    "reason": reasons,
                }
            )

    return df.mapInPandas(batches, f"{id_col} long, format string, reason string")
