"""Multimodal decode paths (VERDICT r05 item 6).

The engine's metadata path (`parse_image_header`) is dependency-free and
always tested; the full pixel decode (`decode_image`) is PIL-backed. The
test below is green BOTH ways: with PIL present it runs the real decode on
generated fixture images and asserts the decoded dimensions agree with the
header-only parse; without PIL it asserts the documented
NotImplementedError stub fires.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from synth_timeseries_data_spark.queries.multimodal import (
    _HAS_PIL,
    decode_image,
    parse_image_header,
)


def _png(w: int, h: int) -> bytes:
    """Minimal valid RGB PNG via stdlib only (no PIL needed to WRITE it)."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(3 * w) for _ in range(h))  # filter-0 rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _gif(w: int, h: int) -> bytes:
    # header + LSD + global 2-color table + one minimal image block
    lsd = struct.pack("<HHBBB", w, h, 0x80, 0, 0)
    table = bytes(6)
    img = b"," + struct.pack("<HHHB", 0, 0, w, h) + b"\x02\x02\x44\x01\x00"
    return b"GIF89a" + lsd + table + img + b";"


def _bmp(w: int, h: int) -> bytes:
    row = (3 * w + 3) // 4 * 4
    size = 54 + row * h
    head = b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0)
    return head + info + bytes(row * h)


FIXTURES = [
    ("png", _png, 320, 240),
    ("png", _png, 17, 331),
    ("gif", _gif, 64, 48),
    ("bmp", _bmp, 100, 60),
]


@pytest.mark.parametrize("fmt,make,w,h", FIXTURES)
def test_header_parse_dimensions(fmt, make, w, h):
    got_w, got_h, got_fmt = parse_image_header(make(w, h))
    assert (got_w, got_h, got_fmt) == (w, h, fmt)


def test_header_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_image_header(b"not an image at all")


@pytest.mark.parametrize("fmt,make,w,h", FIXTURES)
def test_decode_agrees_with_header_or_stubs(fmt, make, w, h):
    payload = make(w, h)
    if not _HAS_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(payload)
        return
    img = decode_image(payload)
    assert img.size == (w, h)
    assert (w, h) == tuple(parse_image_header(payload)[:2])


def test_parse_image_header_jpeg_fill_bytes_and_truncation():
    """ITU T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker — a spec-valid JPEG with padding must still parse; and a
    recognized magic over a truncated header must raise ValueError (the
    documented single exception type), not leak struct.error."""
    import struct

    import pytest

    from synth_timeseries_data_spark.queries.multimodal import parse_image_header

    # minimal JPEG: SOI, APP0 (with a fill byte before it), fill bytes
    # before SOF0 carrying 33x17
    app0 = b"\xff\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
    sof = b"\xff\xff\xff\xc0" + struct.pack(">H", 8) + b"\x08" + struct.pack(
        ">HH", 17, 33
    )
    assert parse_image_header(b"\xff\xd8" + app0 + sof) == (33, 17, "jpeg")

    with pytest.raises(ValueError):
        parse_image_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)  # truncated


def test_parse_image_header_jpeg_standalone_markers_raise():
    """ITU T.81 B.1.1.4: TEM (0x01) and RST0-7 (0xD0-0xD7) are standalone
    markers with NO length field. A header containing one before SOF is
    unwalkable (RSTs belong inside scan data) — the parser must raise the
    documented ValueError rather than misreading payload bytes as a
    length and walking into garbage."""
    import struct

    import pytest

    from synth_timeseries_data_spark.queries.multimodal import parse_image_header

    sof = b"\xff\xc0" + struct.pack(">H", 8) + b"\x08" + struct.pack(">HH", 17, 33)
    for standalone in (b"\xff\x01", b"\xff\xd0", b"\xff\xd7", b"\xff\xd9"):
        # if misparsed as length-carrying, the SOF bytes here would be
        # consumed as the phantom length's payload
        payload = b"\xff\xd8" + standalone + sof
        with pytest.raises(ValueError):
            parse_image_header(payload)


def test_parse_audio_header_walks_chunks_and_validates():
    """The RIFF walker: canonical WAVs round-trip the synthesis parameters
    (mono + stereo, frame math on padded data); extra chunks before fmt
    are skipped WITH the odd-size pad byte; malformed containers (bad
    magic, missing data chunk, inconsistent block align, short fmt) raise
    the documented ValueError."""
    import struct

    import pytest

    from synth_timeseries_data_spark.queries.multimodal import (
        make_wav,
        parse_audio_header,
    )

    # canonical: 7 bytes mono -> padded to 8 -> 4 frames of 2 bytes
    assert parse_audio_header(make_wav(b"1234567", 1, 8000)) == (1, 8000, 16, 4)
    # stereo: 7 bytes -> padded to 8 -> 2 frames of 4 bytes
    assert parse_audio_header(make_wav(b"1234567", 2, 16000)) == (2, 16000, 16, 2)

    # an odd-sized LIST chunk before fmt must be skipped with its pad byte
    wav = make_wav(b"abcd", 1, 24000)
    injected = (
        wav[:12]
        + b"LIST" + struct.pack("<I", 3) + b"xyz" + b"\x00"  # pad to word
        + wav[12:]
    )
    assert parse_audio_header(injected) == (1, 24000, 16, 2)

    with pytest.raises(ValueError):
        parse_audio_header(b"RIFX" + wav[4:])  # bad magic
    with pytest.raises(ValueError):
        parse_audio_header(wav[: wav.index(b"data")])  # no data chunk
    bad_align = bytearray(wav)
    off = wav.index(b"fmt ") + 8 + 12  # block_align field
    bad_align[off : off + 2] = struct.pack("<H", 5)
    with pytest.raises(ValueError):
        parse_audio_header(bytes(bad_align))
    short_fmt = wav[:16] + struct.pack("<I", 8) + wav[20:]
    with pytest.raises(ValueError):
        parse_audio_header(short_fmt)


def test_parse_audio_header_rejects_degenerate_fmt_and_non_pcm():
    """Contract hardening: zero bits/block-align, truncated fmt bodies,
    and non-PCM format tags must all raise the documented ValueError —
    never ZeroDivisionError or struct.error."""
    import struct

    import pytest

    from synth_timeseries_data_spark.queries.multimodal import (
        make_wav,
        parse_audio_header,
    )

    wav = make_wav(b"abcdef", 1, 8000)
    fmt_off = wav.index(b"fmt ") + 8

    zeroed = bytearray(wav)
    # channels=1 kept, bits=0, block_align=0 -> consistency check must fire
    zeroed[fmt_off + 12 : fmt_off + 14] = struct.pack("<H", 0)  # block_align
    zeroed[fmt_off + 14 : fmt_off + 16] = struct.pack("<H", 0)  # bits
    with pytest.raises(ValueError):
        parse_audio_header(bytes(zeroed))

    ieee = bytearray(wav)
    ieee[fmt_off : fmt_off + 2] = struct.pack("<H", 3)  # IEEE float tag
    with pytest.raises(ValueError):
        parse_audio_header(bytes(ieee))

    # fmt declares 16 bytes but the container is cut mid-chunk
    truncated = wav[: fmt_off + 10]
    with pytest.raises(ValueError):
        parse_audio_header(truncated)

    # data chunk declares more sample bytes than the container holds —
    # a truncated file; n_frames must NOT be reported from the declared
    # size (it would promise frames that aren't there).
    cut = wav[:-2]  # drop trailing sample bytes, keep the declared size
    with pytest.raises(ValueError):
        parse_audio_header(cut)


def test_header_parsers_never_raise_anything_but_valueerror():
    """Fuzz the one-exception contract: over arbitrary byte strings (and
    mutated valid containers), both header parsers either return their
    documented tuple of ints/str or raise ValueError — never
    struct.error, ZeroDivisionError, or IndexError. This is the contract
    a corpus-filtering pass relies on when it wraps the parse in one
    except clause."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from synth_timeseries_data_spark.queries.multimodal import (
        make_wav,
        parse_audio_header,
        parse_image_header,
    )

    wav = make_wav(b"fuzz payload bytes", 2, 16000)

    @settings(max_examples=300, deadline=None)
    @given(
        st.one_of(
            st.binary(max_size=96),
            # mutations of a valid container hit the deep branches
            st.tuples(
                st.integers(0, len(wav) - 1), st.binary(min_size=1, max_size=6)
            ).map(lambda t: wav[: t[0]] + t[1] + wav[t[0] + len(t[1]) :]),
        )
    )
    def _check(payload):
        for parser in (parse_audio_header, parse_image_header):
            try:
                out = parser(payload)
            except ValueError:
                continue
            assert isinstance(out, tuple)

    _check()
