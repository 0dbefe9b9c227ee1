"""Audio container header parsing (WAV/FLAC/MP3) — builder round
trips, spec edge cases, and failure isolation through the Arrow stage.
"""

import pytest

from tool_documentsconverter_spark.operators.multimodal import (
    extract_audio_features,
    parse_audio_header,
)
from tool_documentsconverter_spark.sources.transcripts import (
    make_flac_bytes,
    make_mp3_bytes,
    make_wav_bytes,
)


def test_wav_round_trip_exact():
    p = make_wav_bytes(44100, 2, 16, 44100)
    assert parse_audio_header(p) == ("wav", 44100, 2, 16, 1000)
    # integer-floor duration
    p = make_wav_bytes(8000, 1, 8, 1234)
    assert parse_audio_header(p) == ("wav", 8000, 1, 8, 154)


def test_wav_odd_data_chunk_word_alignment():
    # an odd-size chunk is padded to a word boundary; the walk must
    # still find a later fmt chunk
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE"
            + b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4000) + bytes(4000))
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    assert parse_audio_header(p) == ("wav", 8000, 1, 8, 500)


def test_wav_missing_fmt_fails():
    import struct

    body = b"WAVE" + b"data" + struct.pack("<I", 4) + bytes(4)
    with pytest.raises(ValueError):
        parse_audio_header(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_missing_data_gives_null_duration():
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    assert parse_audio_header(p) == ("wav", 8000, 1, 8, None)


def test_flac_round_trip_exact():
    p = make_flac_bytes(48000, 2, 24, 96000)
    assert parse_audio_header(p) == ("flac", 48000, 2, 24, 2000)
    # 20-bit sample rate boundary
    p = make_flac_bytes(96000, 8, 32, 12345)
    assert parse_audio_header(p) == ("flac", 96000, 8, 32,
                                     12345 * 1000 // 96000)


def test_flac_wrong_first_block_fails():
    p = make_flac_bytes(44100, 2, 16, 1000)
    # flip the block type from STREAMINFO(0) to PADDING(1)
    corrupted = p[:4] + bytes([0x81]) + p[5:]
    with pytest.raises(ValueError):
        parse_audio_header(corrupted)


def test_mp3_round_trip_with_and_without_id3():
    p = make_mp3_bytes(128, 44100, 2, 10)
    # frame = 144*128000//44100 = 417 bytes; dur = 4170*8000//128000
    assert parse_audio_header(p) == ("mp3", 44100, 2, None, 260)
    assert len(p) == 4170
    p = make_mp3_bytes(320, 32000, 1, 3, with_id3=True)
    assert parse_audio_header(p) == ("mp3", 32000, 1, None, 108)


def test_mp3_free_bitrate_fails():
    p = bytearray(make_mp3_bytes(128, 44100, 2, 1))
    p[2] = 0x00  # bitrate index 0 = "free" — no CBR duration estimate
    with pytest.raises(ValueError):
        parse_audio_header(bytes(p))


def test_junk_and_empty_fail():
    for payload in (b"NOISEnoise-3", b"", b"RIFFxxxx", None):
        with pytest.raises(ValueError):
            parse_audio_header(payload)


def test_extract_audio_features_isolates_failures(spark):
    rows = [
        (0, make_wav_bytes(16000, 1, 16, 8000)),
        (1, b"garbage-not-audio"),
        (2, make_mp3_bytes(192, 48000, 2, 7, with_id3=True)),
        (3, None),
        (4, make_flac_bytes(44100, 1, 16, 44100)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in extract_audio_features(df).collect()}
    assert got[0].kind == "wav" and got[0].duration_ms == 500
    assert got[1].status == "failed" and got[1].sample_rate is None
    assert got[2].kind == "mp3" and got[2].channels == 2
    assert got[3].status == "failed"
    assert got[4].kind == "flac" and got[4].duration_ms == 1000
    assert all(r.status in ("ok", "failed") for r in got.values())


# ---------------------------------------------------------------------------
# Property: build -> parse is the identity on the header fields, for
# ANY spec-valid parameter combination (not just the query's formulas)
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
# sr capped so byte_rate = sr * block_align stays inside the 4-byte
# RIFF field for every generated combination
@given(sr=st.integers(1, (1 << 20) - 1),
       ch=st.integers(1, 8), bits=st.sampled_from([8, 16, 24, 32]),
       n=st.integers(0, 100000))
def test_wav_property_round_trip(sr, ch, bits, n):
    p = make_wav_bytes(sr, ch, bits, n)
    ba = ch * bits // 8
    k, r, c, b, d = parse_audio_header(p)
    assert (k, r, c, b) == ("wav", sr, ch, bits)
    assert d == (n * ba) * 1000 // (sr * ba)


@settings(max_examples=60, deadline=None)
@given(sr=st.integers(1, (1 << 20) - 1), ch=st.integers(1, 8),
       bits=st.integers(4, 32), total=st.integers(0, (1 << 36) - 1))
def test_flac_property_round_trip(sr, ch, bits, total):
    p = make_flac_bytes(sr, ch, bits, total)
    k, r, c, b, d = parse_audio_header(p)
    assert (k, r, c, b) == ("flac", sr, ch, bits)
    assert d == (total * 1000 // sr if total else None)


@settings(max_examples=60, deadline=None)
@given(br=st.sampled_from([32, 64, 96, 128, 192, 256, 320]),
       sr=st.sampled_from([44100, 48000, 32000]),
       ch=st.integers(1, 2), nf=st.integers(1, 50),
       id3=st.booleans())
def test_mp3_property_round_trip(br, sr, ch, nf, id3):
    p = make_mp3_bytes(br, sr, ch, nf, with_id3=id3)
    k, r, c, b, d = parse_audio_header(p)
    assert (k, r, c, b) == ("mp3", sr, ch, None)
    audio = len(p) - (20 if id3 else 0)
    assert d == audio * 8000 // (br * 1000)
