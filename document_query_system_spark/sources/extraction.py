"""Document ingestion + extraction pipeline (SURVEY.md §2.1 S1-S4,
§2.10 U2): binary payload → sniffed type → per-format text extraction
as a UDTF-shaped mapInPandas.

The reference downloads files, sniffs magic bytes, and runs a
per-format extractor cascade (ref: ingestion_service.py:108-155
MIME sniff; document_processing_service.py:102-537 pdf/docx/eml
extractors). This module re-expresses that on Spark:

- a **landing table** of binary payloads (here synthesized
  deterministically from documents.text — a PDF-like, a DOCX-like
  (ZIP magic), and a real RFC-822 EML per doc — because no real
  document corpus ships with the driver's testdata; a production
  deployment replaces ``landing_table`` with
  ``spark.read.format("binaryFile").load(dir)``, same schema);
- **MIME sniff** as a magic-byte predicate chain on BinaryType (F1);
- **extraction** as mapInPandas over payload bytes: EML parsing uses
  the real stdlib ``email`` parser (the same library path a real
  extractor uses — ref document_processing_service.py:459-537);
  PDF/DOCX "parsing" strips the deterministic container since
  PyMuPDF/python-docx are not installed — ``_extract_pdf_real`` is
  the marked swap-in point, and the surrounding plumbing (binary
  round-trip, per-row dispatch, chunk-row fan-out) is the real thing.

Payload construction is deterministic string concatenation, so sniff
AND extraction outputs are DuckDB-oracle-verified by value.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .tables import load, spread

# Deterministic containers per format. kind chosen by doc_id % 3.
_EML_TMPL = "From: sender-{did}@example.com\r\nTo: dest@example.com\r\nSubject: doc {did}\r\n\r\n{body}"


def landing_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, file_name, payload binary) — the binaryFile-scan
    analog (path→file_name, content→payload; ref DocumentInfo,
    ingestion_service.py:20-31)."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    kind = F.col("doc_id") % 3
    body = F.col("text")
    did = F.col("doc_id").cast("string")
    pdf = F.concat(F.lit("%PDF-1.4\n"), body, F.lit("\n%%EOF"))
    docx = F.concat(F.lit("PK\x03\x04word/"), body)
    eml = F.concat(
        F.lit("From: sender-"), did, F.lit("@example.com\r\nTo: dest@example.com\r\nSubject: doc "),
        did, F.lit("\r\n\r\n"), body,
    )
    name = F.concat(
        F.lit("doc_"), did,
        F.when(kind == 0, F.lit(".pdf")).when(kind == 1, F.lit(".docx")).otherwise(F.lit(".eml")),
    )
    payload = F.when(kind == 0, pdf).when(kind == 1, docx).otherwise(eml)
    return docs.select(
        "doc_id",
        name.alias("file_name"),
        F.encode(payload, "UTF-8").cast("binary").alias("payload"),
    )


_LANDING_SQL = """
landing AS (
  SELECT doc_id,
         'doc_' || doc_id ||
           CASE doc_id % 3 WHEN 0 THEN '.pdf' WHEN 1 THEN '.docx' ELSE '.eml' END
           AS file_name,
         CASE doc_id % 3
           WHEN 0 THEN '%PDF-1.4' || chr(10) || text || chr(10) || '%%EOF'
           WHEN 1 THEN 'PK' || chr(3) || chr(4) || 'word/' || text
           ELSE 'From: sender-' || doc_id || '@example.com' || chr(13) || chr(10)
                || 'To: dest@example.com' || chr(13) || chr(10)
                || 'Subject: doc ' || doc_id || chr(13) || chr(10)
                || chr(13) || chr(10) || text
         END AS payload
  FROM documents
)
"""


@register(
    "q_extract_sniff",
    oracle=f"""
WITH {_LANDING_SQL}
SELECT doc_id, file_name,
       CASE WHEN payload LIKE '%PDF%' AND substr(payload, 1, 4) = '%PDF'
              THEN 'application/pdf'
            WHEN substr(payload, 1, 2) = 'PK' THEN
              'application/vnd.openxmlformats-officedocument.wordprocessingml.document'
            WHEN substr(payload, 1, 5) = 'From:' THEN 'message/rfc822'
            ELSE 'application/octet-stream'
       END AS mime,
       substr(payload, 1, 4) = '%PDF' AND payload LIKE '%' || '%%EOF' AS pdf_valid
FROM landing
""",
)
def q_extract_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F4 on real BinaryType: magic-byte MIME dispatch + content
    validation (%PDF header, %%EOF trailer — ref:
    ingestion_service.py:108-155, 193-218), decoded only for the
    sniffed prefix."""
    lt = landing_table(spark, sf_dir)
    head = F.decode(F.substring("payload", 1, 16), "UTF-8")
    text = F.decode(F.col("payload"), "UTF-8")
    mime = (
        F.when(head.startswith("%PDF"), F.lit("application/pdf"))
        .when(head.startswith("PK"), F.lit(
            "application/vnd.openxmlformats-officedocument.wordprocessingml.document"))
        .when(head.startswith("From:"), F.lit("message/rfc822"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return lt.select(
        "doc_id",
        "file_name",
        mime.alias("mime"),
        (head.startswith("%PDF") & text.endswith("%%EOF")).alias("pdf_valid"),
    )


_BINARY_DIR_READY: set[tuple[int, str]] = set()


def _ensure_landing_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a small landing directory of real files (one per
    doc for the first 50 docs) so the binaryFile source has something
    to scan — the on-disk twin of the reference's document_cache
    (ref: ingestion_service.py:322-329)."""
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(tempfile.gettempdir(), "dqs_landing", tag)
    key = (id(spark), sf_dir)
    if key not in _BINARY_DIR_READY:
        os.makedirs(path, exist_ok=True)
        rows = (
            landing_table(spark, sf_dir)
            .filter(F.col("doc_id") < 50)
            .select("file_name", "payload")
            .collect()
        )
        for r in rows:
            with open(os.path.join(path, r.file_name), "wb") as f:
                f.write(bytes(r.payload))
        _BINARY_DIR_READY.add(key)
    return path


@register(
    "q_binaryfile_scan",
    oracle="""
SELECT 'doc_' || doc_id ||
         CASE doc_id % 3 WHEN 0 THEN '.pdf' WHEN 1 THEN '.docx' ELSE '.eml' END
         AS file_name,
       CAST(length(CASE doc_id % 3
         WHEN 0 THEN '%PDF-1.4' || chr(10) || text || chr(10) || '%%EOF'
         WHEN 1 THEN 'PK' || chr(3) || chr(4) || 'word/' || text
         ELSE 'From: sender-' || doc_id || '@example.com' || chr(13) || chr(10)
              || 'To: dest@example.com' || chr(13) || chr(10)
              || 'Subject: doc ' || doc_id || chr(13) || chr(10)
              || chr(13) || chr(10) || text
       END) AS BIGINT) AS n_bytes
FROM documents
WHERE doc_id < 50
""",
)
def q_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2: the real ``binaryFile`` source — files on disk scanned
    as (path, modificationTime, length, content) rows. This is the
    production entry of the extraction pipeline (landing_table is its
    synthetic stand-in); file name and byte length are value-checked.
    The payloads here are pure ASCII, so length == char count in the
    oracle."""
    path = _ensure_landing_dir(spark, sf_dir)
    bf = spark.read.format("binaryFile").load(path)
    return bf.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.length("content").cast("long").alias("n_bytes"),
    )


def _extract_pdf_real(payload: bytes) -> str:  # pragma: no cover - stub
    """Swap-in point for PyMuPDF → pdfplumber → OCR cascade (ref:
    document_processing_service.py:102-271). Not installed here."""
    raise NotImplementedError("install pymupdf/pdfplumber and route here")


def _extract_one(file_name: str, payload: bytes) -> tuple[str, str, str]:
    """(doc_type, subject, body_text) for one landing row."""
    if file_name.endswith(".eml"):
        import email

        msg = email.message_from_bytes(payload)
        return "eml", msg.get("Subject", ""), msg.get_payload()
    raw = payload.decode("utf-8")
    if file_name.endswith(".pdf"):
        body = raw.removeprefix("%PDF-1.4\n").removesuffix("\n%%EOF")
        return "pdf", "", body
    return "docx", "", raw.removeprefix("PK\x03\x04word/")


@register(
    "q_extract_text",
    oracle=f"""
WITH {_LANDING_SQL}
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx' ELSE 'eml' END AS doc_type,
       CASE doc_id % 3 WHEN 2 THEN 'doc ' || doc_id ELSE '' END AS subject,
       text AS body_text,
       CAST(length(text) AS BIGINT) AS body_chars
FROM landing JOIN documents USING (doc_id)
""",
)
def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2-S4/U2: per-format text extraction inside mapInPandas — EML
    via the stdlib ``email`` parser (headers become columns, ref:
    document_processing_service.py:480-487), PDF/DOCX by container
    strip (see _extract_pdf_real for the codec swap-in). Extraction
    recovers the original text exactly, which is what the oracle
    checks."""
    import pandas as pd

    lt = landing_table(spark, sf_dir)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [
                _extract_one(fn, pl)
                for fn, pl in zip(pdf["file_name"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "doc_type": [r[0] for r in rows],
                    "subject": [r[1] for r in rows],
                    "body_text": [r[2] for r in rows],
                    "body_chars": [len(r[2]) for r in rows],
                }
            )

    return lt.mapInPandas(
        gen,
        "doc_id long, doc_type string, subject string, body_text string, "
        "body_chars long",
    )


@register(
    "q_extract_chunks",
    oracle=f"""
WITH {_LANDING_SQL},
paras AS (
  SELECT doc_id,
         unnest(string_split(text, '. ')) AS para,
         generate_subscripts(string_split(text, '. '), 1) - 1 AS chunk_seq
  FROM landing JOIN documents USING (doc_id)
)
SELECT doc_id, chunk_seq,
       doc_id || '_c' || chunk_seq AS chunk_id,
       para AS content,
       CAST(len(list_filter(string_split(para, ' '), t -> t <> '')) AS BIGINT)
         AS word_count
FROM paras
WHERE length(para) > 20
""",
)
def q_extract_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 end-to-end: landing payload → extract → chunk rows (one
    file → N chunks, the UDTF fan-out of the reference's
    rechunk_document, ref: document_processing_service.py:551-587).
    Chunks = sentence-ish '. ' segments, meaningful-length filter > 20
    chars (F5 analog, ref :295), stable (doc_id, chunk_seq) keys —
    Spark has no implicit row order, so position is a column
    (SURVEY §2.6 O3)."""
    import pandas as pd

    lt = landing_table(spark, sf_dir)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"doc_id": [], "chunk_seq": [], "chunk_id": [],
                   "content": [], "word_count": []}
            for did, fn, pl in zip(pdf["doc_id"], pdf["file_name"], pdf["payload"]):
                _, _, body = _extract_one(fn, pl)
                for seq, para in enumerate(body.split(". ")):
                    if len(para) <= 20:
                        continue
                    out["doc_id"].append(did)
                    out["chunk_seq"].append(seq)
                    out["chunk_id"].append(f"{did}_c{seq}")
                    out["content"].append(para)
                    out["word_count"].append(len(para.split()))
            yield pd.DataFrame(out)

    return lt.mapInPandas(
        gen,
        "doc_id long, chunk_seq int, chunk_id string, content string, "
        "word_count long",
    )
