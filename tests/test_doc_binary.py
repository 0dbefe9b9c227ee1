"""E7 legacy binary .doc: the pure-stdlib OLE2 compound-file reader
and Word 97 piece-table text extraction, plus its wiring into the
string (extract_turn) and binary (extract_document_bytes) dispatch.

Reference semantics: .doc converts via antiword text extraction into
the fenced-text wrap (doc_to_md/docx_converter.py:107-142,
main.py:165-171); fixtures are written by ole.make_min_doc_bytes
(valid [MS-CFB]/[MS-DOC] layout: FAT chains, miniFAT ministream,
1Table piece table).
"""

import pytest

from tool_documentsconverter_spark import kernels as K
from tool_documentsconverter_spark.ole import (
    CompoundFile,
    extract_doc_text,
    make_min_doc_bytes,
)


def test_roundtrip_unicode_piece():
    text = "Hello legacy Word.\rSecond paragraph with ümlaut and 🚀🚀."
    out = extract_doc_text(make_min_doc_bytes(text))
    assert out == text.replace("\r", "\n")


def test_roundtrip_cp1252_piece():
    text = "plain cp1252 body\rrow\x07cell"
    out = extract_doc_text(make_min_doc_bytes(text, compressed=True))
    assert out == "plain cp1252 body\nrow\ncell"


def test_small_doc_uses_ministream_large_uses_fat():
    small = make_min_doc_bytes("tiny")
    cf = CompoundFile(small)
    # both streams sit below the 4096 cutoff -> ministream populated
    assert cf.minifat and len(cf.ministream) > 0
    assert extract_doc_text(small) == "tiny"

    body = "long line " * 600  # WordDocument > 4096 -> regular FAT
    large = make_min_doc_bytes(body)
    cf2 = CompoundFile(large)
    assert cf2.entries["WordDocument"][1] >= 4096
    assert extract_doc_text(large) == body  # only the final \r drops


def test_control_chars_cleaned():
    text = "a\x13field\x14code\x15b\rtab\there\x0bsoft"
    out = extract_doc_text(make_min_doc_bytes(text))
    assert out == "afieldcodeb\ntab\there\nsoft"


def test_fcmin_fcmac_fallback():
    # zero out the CLX pointer: reader must fall back to fcMin..fcMac
    import struct

    from tool_documentsconverter_spark.ole import _FIB_LCBCLX

    payload = bytearray(make_min_doc_bytes("fallback body\rsecond"))
    cf = CompoundFile(bytes(payload))
    word = cf.stream("WordDocument")
    # locate the FIB inside the raw container and clear lcbClx
    idx = payload.find(word[:64])
    struct.pack_into("<I", payload, idx + _FIB_LCBCLX, 0)
    assert extract_doc_text(bytes(payload)) == "fallback body\nsecond"


def test_garbage_rejected():
    with pytest.raises(ValueError):
        extract_doc_text(b"\x00\x01GARBAGE")
    with pytest.raises(Exception):
        extract_doc_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 600)


def test_sniff_and_extract_turn_dispatch():
    payload = make_min_doc_bytes("Kernel dispatch body.\rPara two.")
    s = payload.decode("latin-1")
    assert s.encode("latin-1") == payload  # latin-1 is byte-bijective
    assert K.sniff_format(s) == K.FMT_DOC
    md, status, message = K.extract_turn("conv-9", 3, s)
    assert status == K.OK and message == ""
    assert md == K.wrap_text_md(
        "conv-9_00003", "Kernel dispatch body.\nPara two."
    )


def test_declared_doc_garbage_fails_isolated():
    md, status, message = K.extract_turn("c", 0, "\x00\x01NOPE", fmt_hint="doc")
    assert status == K.FAILED
    assert "OLE2" in message
    assert md.startswith("# c_00000")  # error artifact still emitted


def test_binary_dispatch():
    payload = make_min_doc_bytes("Binary path.\rBody.")
    md, status, message = K.extract_document_bytes("legacy-1", payload)
    assert status == K.OK
    assert md == K.wrap_text_md("legacy-1", "Binary path.\nBody.")
