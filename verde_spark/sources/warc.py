"""WARC (Web ARChive, ISO 28500) record reader — the Common-Crawl front
door for the input_hint table ``(url, warc_ts, html, text, lang)``.

Common Crawl publishes crawls as many ~1 GiB ``.warc`` files; each file is
a concatenation of records (``warcinfo``, ``request``, ``response``, ...),
and each ``response`` record's block is a full HTTP response (status line +
headers + body).  ``read_warc`` turns a directory of such files into the
input_hint page table:

* ``spark.read.format("binaryFile")`` gives one row per file — at cluster
  scale that is one task per ~1 GiB WARC file, the same unit of work the
  Common Crawl layout was designed for.  No file is ever split mid-record,
  so no record-boundary coordination is needed between tasks.
* ``split_warc_records`` is an Arrow-batched ``mapInPandas`` over those
  file blobs: a pure per-file parse (headers → Content-Length → block),
  zero shuffle, emitting one row per ``response`` record with the HTTP
  envelope stripped — ``(url, warc_ts, html binary, http_status)``.

The parser is from scratch against the public WARC/1.0 format (record =
``WARC/1.0\\r\\n`` + header lines + ``\\r\\n\\r\\n`` + Content-Length block
+ ``\\r\\n\\r\\n``); ``warc_bytes`` is its deterministic synthesizer twin so
tests and driver queries need no external data (the round-trip property —
synthesize → parse → original rows — is the correctness contract).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "warc_bytes",
    "parse_warc",
    "split_warc_records",
    "read_warc",
    "warc_table_from_documents",
]

_CRLF = b"\r\n"

#: schema of the parsed-record output (html keeps the raw HTTP body bytes;
#: decode/extract stays a separate, already-tested stage)
RECORD_SCHEMA = (
    "url string, warc_ts timestamp, html binary, http_status int, "
    "warc_file string"
)


def warc_bytes(
    records: Iterable[tuple[str, str, bytes]],
    *,
    http_status: int = 200,
    content_type: str = "text/html",
) -> bytes:
    """Serialize ``(url, iso_ts, body)`` triples as a WARC/1.0 byte blob.

    Deterministic (no uuids, no clock): the record id is derived from the
    url, so the same input always yields the same bytes.  Each record is a
    ``response`` whose block is a minimal HTTP/1.1 response envelope around
    *body* — the same shape Common Crawl stores, so the parser exercised in
    tests is the one a real crawl needs.
    """
    out = bytearray()
    for url, iso_ts, body in records:
        http = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("ascii") + body
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:verde-spark:{url}>\r\n"
            f"WARC-Date: {iso_ts}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("ascii")
        out += header + http + _CRLF + _CRLF
    return bytes(out)


def _parse_headers(blob: bytes, start: int) -> tuple[dict[str, str], int]:
    """Parse ``Key: Value`` lines from *start* until the blank line.

    Returns (headers lower-cased, offset just past the blank line).
    """
    headers: dict[str, str] = {}
    pos = start
    while True:
        eol = blob.find(_CRLF, pos)
        if eol < 0:  # truncated record: treat rest as final line
            eol = len(blob)
        line = blob[pos:eol]
        pos = min(eol + 2, len(blob))
        if not line:
            return headers, pos
        sep = line.find(b":")
        if sep > 0:
            key = line[:sep].strip().lower().decode("ascii", "replace")
            headers[key] = line[sep + 1 :].strip().decode("ascii", "replace")
        if pos >= len(blob):
            return headers, pos


def parse_warc(blob: bytes) -> Iterator[dict]:
    """Yield one dict per ``response`` record in a WARC/1.0 byte blob.

    Pure function of the bytes (importable without Spark — it is the
    reference implementation the Spark reader wraps).  Non-response
    records (warcinfo, request, metadata) are skipped but still consumed
    via their Content-Length, so a full Common-Crawl-shaped file walks
    cleanly.  The HTTP envelope is stripped: ``html`` is the response body
    only, ``http_status`` the parsed status code (None when the block is
    not an HTTP response).
    """
    pos = 0
    n = len(blob)
    while pos < n:
        marker = blob.find(b"WARC/", pos)
        if marker < 0:
            return
        # skip the version line itself
        eol = blob.find(_CRLF, marker)
        if eol < 0:
            return
        headers, body_start = _parse_headers(blob, eol + 2)
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            # unrecoverable framing: resync on the next record marker
            pos = marker + 5
            continue
        if length < 0:
            # a negative Content-Length (corrupt/adversarial) would move
            # pos BACKWARDS past this record's own marker, and the next
            # find(b"WARC/") would re-parse the same record forever —
            # treat it like unparseable framing and resync forward
            pos = marker + 5
            continue
        block = blob[body_start : body_start + length]
        # pos must strictly advance past this record's marker no matter
        # what the headers claimed (second backstop against loops)
        pos = max(body_start + length, marker + 5)
        if headers.get("warc-type", "").lower() == "response":
            status = None
            body = block
            if block[:5] == b"HTTP/":
                head_end = block.find(_CRLF + _CRLF)
                if head_end >= 0:
                    status_line = block[: block.find(_CRLF)]
                    parts = status_line.split(b" ")
                    if len(parts) >= 2 and parts[1].isdigit():
                        status = int(parts[1])
                    body = block[head_end + 4 :]
            yield {
                "url": headers.get("warc-target-uri"),
                "warc_ts": headers.get("warc-date"),
                "html": body,
                "http_status": status,
            }


def split_warc_records(
    files: DataFrame,
    *,
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """One row per WARC ``response`` record from a DataFrame of file blobs.

    *files* is typically ``spark.read.format("binaryFile").load(dir)``
    (columns ``path``/``content``).  The parse is an Arrow-batched
    ``mapInPandas`` — per-file, embarrassingly parallel, zero shuffle; the
    output partitioning is the input file partitioning, which at cluster
    scale is one ~1 GiB WARC file per task.
    """
    has_path = path_col in files.columns
    cols = [content_col] + ([path_col] if has_path else [])

    def explode_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, file_row in pdf.iterrows():
                blob = file_row[content_col]
                fname = file_row[path_col] if has_path else ""
                if blob is None:
                    continue
                for rec in parse_warc(bytes(blob)):
                    rec["warc_file"] = fname
                    rows.append(rec)
            out = pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "http_status", "warc_file"],
            )
            if len(out):
                out["warc_ts"] = pd.to_datetime(
                    out["warc_ts"], utc=True, errors="coerce"
                ).dt.tz_localize(None)
                out["http_status"] = out["http_status"].astype("Int32")
            else:
                out["warc_ts"] = pd.Series([], dtype="datetime64[ns]")
                out["http_status"] = pd.Series([], dtype="Int32")
            yield out

    return files.select(*cols).mapInPandas(explode_records, RECORD_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory (or glob) of ``.warc`` files into the record table.

    ``binaryFile`` gives one task per file; pass many files for
    parallelism (the Common Crawl layout: thousands of ~1 GiB segments).
    """
    files = spark.read.format("binaryFile").load(path)
    return split_warc_records(files)


def warc_table_from_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    files: int = 8,
) -> DataFrame:
    """Deterministic WARC *file* blobs synthesized from a documents table.

    Groups documents into *files* buckets by ``pmod(hash(id))`` and
    serializes each bucket (sorted by id — deterministic bytes) with
    :func:`warc_bytes`.  This is the distributed synthesizer used by tests
    and the driver round-trip query: documents → WARC blobs → ``read``
    back via :func:`split_warc_records` must reproduce the documents.
    Output: ``(path string, content binary)`` — the binaryFile shape.
    """
    # ids must be integral: the synthesized url/timestamp embed int(id),
    # so a string id would crash int() inside the applyInPandas task —
    # fail at validation time with a clear message instead
    id_type = docs.schema[id_col].dataType.typeName()
    if id_type not in ("long", "integer", "short", "byte"):
        raise ValueError(
            f"warc_table_from_documents needs an integral {id_col!r} "
            f"(got {id_type}); hash string ids first (e.g. xxhash64)"
        )
    bucketed = docs.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
    ).withColumn("__bucket", F.pmod(F.xxhash64(F.col("__id")), F.lit(files)))

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(key[0])
        pdf = pdf.sort_values("__id")
        recs = [
            (
                f"https://example.com/doc/{int(i)}",
                # deterministic per-doc timestamp: seconds since epoch =
                # id mod 2^31 (ids can be arbitrary 64-bit hashes — raw
                # values overflow pandas' ns-epoch Timestamp range)
                pd.Timestamp(int(i) % (1 << 31), unit="s", tz="UTC").strftime(
                    "%Y-%m-%dT%H:%M:%SZ"
                ),
                ("" if t is None else str(t)).encode("utf-8"),
            )
            for i, t in zip(pdf["__id"], pdf["__text"])
        ]
        return pd.DataFrame(
            {
                "path": [f"synthetic/part-{bucket:05d}.warc"],
                "content": [warc_bytes(recs)],
            }
        )

    return bucketed.groupBy("__bucket").applyInPandas(
        build, "path string, content binary"
    )
