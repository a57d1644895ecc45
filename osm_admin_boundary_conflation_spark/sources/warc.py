"""WARC (Web ARChive, ISO 28500) source — the container Common Crawl
actually ships web pages in, read and written from scratch.

The north-star input is "Common-Crawl-style web pages"; upstream those
arrive as `.warc.gz`: a CONCATENATION of independently-gzipped members,
one WARC record per member. Each record is

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...            (WARC-Type, WARC-Target-URI,
    \r\n                                       WARC-Date, Content-Length)
    <Content-Length bytes of block>\r\n\r\n

For `response` records the block is an HTTP response (status line +
headers + \r\n\r\n + body); the page html is the HTTP body.

Read path: `binaryFile` scan (one row per archive, file-parallel) →
`mapInPandas` that walks gzip members with zlib(wbits=31) streaming
decompression and parses records — Arrow-batched, no per-row Python.
Per-FILE parallelism is the honest grain for .warc.gz: gzip members
are not seekable without an index, and Common Crawl solves this by
sharding into ~1 GB archives (100k files per crawl), so file-count ≫
executor-count and splitting inside one archive buys nothing. With a
`.warc.paths`-style member-offset index (cc provides cdx), swap the
grain to (file, offset-range) with the same parser — documented swap,
same record semantics.

Write path mirrors it: one archive per partition via mapInPandas,
each record an independent gzip member (mtime=0, fixed OS byte —
byte-deterministic) so archives are themselves concatenation-mergeable
the way real crawlers append.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_RECORD_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("http_status", LongType()),
        StructField("html", BinaryType()),
    ]
)


def build_warc_record(url: str, date: str, html: bytes, status: int = 200) -> bytes:
    """One WARC/1.0 response record (uncompressed)."""
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: text/html\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode() + html
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(http)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        "\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def gzip_member(raw: bytes) -> bytes:
    """Deterministic gzip member: mtime=0 and a fixed OS byte so the
    same record always compresses to the same bytes."""
    blob = gzip.compress(raw, compresslevel=6, mtime=0)
    return blob[:9] + b"\x03" + blob[10:]


def parse_warc_gz(blob: bytes) -> Iterator[tuple[str, str, int, bytes]]:
    """Walk concatenated gzip members → (url, warc_date, status, html).
    Streaming zlib with wbits=31 consumes exactly one member per pass;
    `unused_data` hands back the start of the next member — the same
    loop a record-at-a-time CC reader runs."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        raw = d.decompress(blob[pos:])
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"stuck gzip member at byte {pos}")
        pos += consumed
        rec = _parse_record(raw)
        if rec is not None:
            yield rec


def _parse_record(raw: bytes) -> tuple[str, str, int, bytes] | None:
    """None for non-response records (warcinfo/request/metadata — present
    in every real Common Crawl archive); callers skip them so downstream
    page counts never include placeholder rows (ADVICE r06)."""
    if not raw.startswith(b"WARC/1.0\r\n") and not raw.startswith(b"WARC/1.1\r\n"):
        raise ValueError("not a WARC record: bad version line")
    hdr_end = raw.index(b"\r\n\r\n")
    headers: dict[str, str] = {}
    for line in raw[raw.index(b"\r\n") + 2 : hdr_end].split(b"\r\n"):
        k, _, v = line.partition(b":")
        headers[k.strip().decode().lower()] = v.strip().decode()
    clen = int(headers["content-length"])
    block = raw[hdr_end + 4 : hdr_end + 4 + clen]
    if len(block) != clen:
        raise ValueError("truncated WARC record block")
    if headers.get("warc-type") != "response":
        return None
    status_line, _, rest = block.partition(b"\r\n")
    status = int(status_line.split(b" ")[1])
    body = rest[rest.index(b"\r\n\r\n") + 4 :] if b"\r\n\r\n" in rest else b""
    return (
        headers["warc-target-uri"],
        headers.get("warc-date", ""),
        status,
        body,
    )


def write_warc_archives(
    pages: DataFrame, out_dir: str, url_col: str = "url",
    date_col: str = "warc_date", html_col: str = "html",
    prefix: str = "part",
) -> None:
    """One `.warc.gz` per partition (the CC sharding shape). Rows are
    written in (url) order within each archive so the layout is
    deterministic for a given partitioning."""
    import os

    def dump(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks, n = [], 0
        for pdf in it:
            for _, r in pdf.sort_values(url_col).iterrows():
                rec = build_warc_record(
                    r[url_col], r[date_col], bytes(r[html_col])
                )
                chunks.append(gzip_member(rec))
                n += 1
        if chunks:
            with open(os.path.join(out_dir, f"{prefix}-{pid:05d}.warc.gz"), "wb") as f:
                f.writelines(chunks)
        yield pd.DataFrame({"n": [n]})

    os.makedirs(out_dir, exist_ok=True)
    pages.mapInPandas(dump, "n long").agg(F.sum("n")).collect()


def write_warc_archives_indexed(
    pages: DataFrame, out_dir: str, url_col: str = "url",
    date_col: str = "warc_date", html_col: str = "html",
    prefix: str = "part",
) -> DataFrame:
    """Like write_warc_archives, but ALSO emits the CDX-style member
    index — (url, filename, member_offset, member_length) — as the
    returned DataFrame, built in the SAME pass that writes the bytes
    (offsets are exact because each record is an independent gzip
    member). This is the index Common Crawl publishes alongside its
    archives; with it, reads drop from file-grain to member-grain
    (read_warc_members below) — fetch ONE page from a 1 GB shard
    without touching the rest."""
    import os

    def dump(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"{prefix}-{pid:05d}.warc.gz"
        chunks, idx, off = [], [], 0
        for pdf in it:
            for _, r in pdf.sort_values(url_col).iterrows():
                member = gzip_member(
                    build_warc_record(r[url_col], r[date_col], bytes(r[html_col]))
                )
                chunks.append(member)
                idx.append((r[url_col], fname, off, len(member)))
                off += len(member)
        if chunks:
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.writelines(chunks)
        yield pd.DataFrame(
            idx, columns=["url", "filename", "member_offset", "member_length"]
        )

    os.makedirs(out_dir, exist_ok=True)
    return pages.mapInPandas(
        dump,
        "url string, filename string, member_offset long, member_length long",
    )


def read_warc_members(index: DataFrame, archive_dir: str) -> DataFrame:
    """Random-access WARC reads: each index row seeks to its member
    offset and decompresses exactly member_length bytes — the
    cdx-offset grain the module docstring names as the real-scale swap
    for file-level parallelism. Index rows are processed per partition
    with one open handle per distinct file (rows are grouped by
    filename inside the batch), so a partition holding k members of
    one shard does one open + k seeks, never a full-shard scan."""
    import os

    def fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for fname, grp in pdf.groupby("filename", sort=True):
                with open(os.path.join(archive_dir, fname), "rb") as f:
                    for _, r in grp.iterrows():
                        f.seek(int(r["member_offset"]))
                        member = f.read(int(r["member_length"]))
                        rec = _parse_record(zlib.decompress(member, wbits=31))
                        if rec is not None:
                            rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return index.mapInPandas(fetch, WARC_RECORD_SCHEMA)


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """`.warc.gz` archives → (url, warc_date, http_status, html)."""
    raw = spark.read.format("binaryFile").load(path_glob).select("content")

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_warc_gz(bytes(blob)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return raw.mapInPandas(parse, WARC_RECORD_SCHEMA)
