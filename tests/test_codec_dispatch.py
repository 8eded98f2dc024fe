"""Codec-seam dispatch: real libraries route automatically when
installed; this sandbox (no pymupdf/pytesseract/sentence-transformers)
must pick the deterministic stand-ins cleanly (r4 verdict item 7)."""

from __future__ import annotations

import pytest

from document_query_system_spark.sources import extraction as ex


def test_sandbox_has_no_codec_libs():
    # The dispatch flags reflect this environment; if a codec lib ever
    # appears here, the oracle-exactness assumptions below need review.
    assert ex._HAS_PYMUPDF is False
    assert ex._HAS_TESSERACT is False


def test_pdf_dispatch_picks_minimal_parser_and_round_trips():
    text = "hello world " * 30
    payload = ex._build_pdf_minimal(text)
    assert ex.extract_pdf_text(payload) == text


def test_pdf_dispatch_routes_to_real_codec_when_flagged(monkeypatch):
    monkeypatch.setattr(ex, "_HAS_PYMUPDF", True)
    with pytest.raises(ImportError):
        ex.extract_pdf_text(ex._build_pdf_minimal("x"))


def test_ocr_dispatch_is_content_based():
    text = "synthetic glyph page"
    raster = ex._rasterize_page(text)
    assert ex.ocr_raster(raster) == text
    # A non-RASTER1 image without pytesseract is a clear error, not a
    # silent wrong decode.
    with pytest.raises(NotImplementedError):
        ex.ocr_raster(b"\x89PNG\r\n\x1a\nnot-our-format")


def test_ocr_dispatch_keeps_glyph_decode_even_with_tesseract(monkeypatch):
    # Installing pytesseract must NOT change RASTER1 decoding (our own
    # format) — only non-RASTER1 images route to the library.
    monkeypatch.setattr(ex, "_HAS_TESSERACT", True)
    text = "stable under install"
    assert ex.ocr_raster(ex._rasterize_page(text)) == text
    with pytest.raises(ImportError):
        ex.ocr_raster(b"\x89PNG real image bytes")


def test_embed_dispatch_picks_hashing_embedder(spark):
    from document_query_system_spark.functions import embed as em

    assert em._HAS_ST is False
    df = spark.createDataFrame([(1, "alpha beta")], "id int, text string")
    auto = em.embed_auto(df, "text").select("embedding").first()[0]
    det = em.embed_df(df, "text").select("embedding").first()[0]
    assert auto == det
