"""Legacy binary ``.doc`` support (E7): a pure-stdlib OLE2
compound-file (CFB) reader plus Word 97-2003 text extraction.

The reference converts ``.doc`` by shelling out to antiword/catdoc and
wrapping the extracted text in the fenced-text Markdown template
(doc_to_md/docx_converter.py:107-142, doc_to_md/main.py:165-171;
``.doc`` is in the default include set, main.py:198-206).  Neither
tool exists in this sandbox — and an external-process converter is the
wrong shape for a Spark executor anyway — so the text extraction is
reimplemented from the PUBLIC file-format specs:

 - [MS-CFB]: OLE compound file binary (header, FAT, miniFAT,
   directory) — the container.
 - [MS-DOC]: the FIB, the CLX/piece table in the 0Table/1Table
   stream, and PCD fc encoding (cp1252 vs UTF-16LE pieces).

``extract_doc_text`` walks the piece table (the same route antiword
takes), falling back to the FIB's fcMin..fcMac window for simple
non-complex documents when no piece table is present.

``make_min_doc_bytes`` writes a minimal-but-valid CFB + FIB + piece
table ``.doc`` for fixtures/tests (this sandbox has no real Word files
and may not fabricate external data); it exercises the same reader
paths a real Word 97 file hits (FAT chains, directory walk, 1Table
piece table, UTF-16 and cp1252 pieces).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC

_U16 = struct.Struct("<H")
_U32 = struct.Struct("<I")


def _u16(b: bytes, off: int) -> int:
    return _U16.unpack_from(b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return _U32.unpack_from(b, off)[0]


class CompoundFile:
    """Minimal [MS-CFB] reader: named streams out of an OLE2 container.

    Supports v3 (512-byte sectors) and v4 (4096), FAT chains incl.
    DIFAT overflow sectors, and the mini stream (miniFAT) for streams
    below the 4096-byte cutoff.
    """

    def __init__(self, data: bytes) -> None:
        if data[:8] != OLE_MAGIC:
            raise ValueError("not an OLE2 compound file")
        self.data = data
        self.sector_size = 1 << _u16(data, 30)
        self.mini_size = 1 << _u16(data, 32)
        self.mini_cutoff = _u32(data, 56)
        self._load_fat()
        self._load_directory()
        self._load_minifat()

    # -- sector plumbing ---------------------------------------------
    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.sector_size
        return self.data[off:off + self.sector_size]

    def _load_fat(self) -> None:
        data = self.data
        difat = list(struct.unpack_from("<109I", data, 76))
        # DIFAT overflow chain (sector-sized arrays, last u32 = next)
        next_dif = _u32(data, 68)
        n_dif = _u32(data, 72)
        per = self.sector_size // 4 - 1
        for _ in range(n_dif):
            if next_dif in (ENDOFCHAIN, FREESECT):
                break
            sec = self._sector(next_dif)
            entries = struct.unpack_from(f"<{per + 1}I", sec)
            difat.extend(entries[:per])
            next_dif = entries[per]
        self.fat: List[int] = []
        per_fat = self.sector_size // 4
        unpack_fat = struct.Struct(f"<{per_fat}I").unpack_from
        for s in difat:
            if s in (FREESECT, ENDOFCHAIN):
                continue
            self.fat.extend(unpack_fat(self._sector(s)))

    def _chain(self, start: int, fat: List[int]) -> List[int]:
        out: List[int] = []
        s = start
        seen = set()
        while s not in (ENDOFCHAIN, FREESECT) and s < len(fat):
            if s in seen:  # corrupt cycle guard
                break
            seen.add(s)
            out.append(s)
            s = fat[s]
        return out

    def _read_chain(self, start: int, size: int) -> bytes:
        buf = b"".join(self._sector(s) for s in self._chain(start, self.fat))
        return buf[:size]

    # -- directory + mini stream --------------------------------------
    def _load_directory(self) -> None:
        raw = b"".join(
            self._sector(s) for s in self._chain(_u32(self.data, 48), self.fat)
        )
        self.entries: Dict[str, Tuple[int, int, int]] = {}
        self._root: Optional[Tuple[int, int]] = None
        for off in range(0, len(raw) - 127, 128):
            name_len = _u16(raw, off + 64)
            obj_type = raw[off + 66]
            if obj_type == 0 or name_len < 2:
                continue
            name = raw[off:off + name_len - 2].decode("utf-16-le",
                                                      errors="replace")
            start = _u32(raw, off + 116)
            size = _u32(raw, off + 120)  # low dword is enough for v3
            if obj_type == 5:  # root: owns the mini stream
                self._root = (start, size)
            else:
                self.entries[name] = (start, size, obj_type)

    def _load_minifat(self) -> None:
        start = _u32(self.data, 60)
        n = _u32(self.data, 64)
        self.minifat: List[int] = []
        if n == 0 or start in (ENDOFCHAIN, FREESECT):
            self.ministream = b""
            return
        raw = b"".join(self._sector(s) for s in self._chain(start, self.fat))
        self.minifat = list(struct.unpack_from(f"<{len(raw) // 4}I", raw))
        if self._root:
            self.ministream = self._read_chain(self._root[0], self._root[1])
        else:
            self.ministream = b""

    def stream(self, name: str) -> bytes:
        if name not in self.entries:
            raise KeyError(f"stream not found: {name}")
        start, size, _ = self.entries[name]
        if size < self.mini_cutoff and self.minifat:
            out: List[bytes] = []
            for s in self._chain(start, self.minifat):
                off = s * self.mini_size
                out.append(self.ministream[off:off + self.mini_size])
            return b"".join(out)[:size]
        return self._read_chain(start, size)


# ---------------------------------------------------------------------------
# [MS-DOC] text extraction
# ---------------------------------------------------------------------------
_FIB_FLAGS = 0x000A       # fComplex=0x0004, fWhichTblStm=0x0200
_FIB_FCMIN = 0x0018
_FIB_FCMAC = 0x001C
_FIB_CCPTEXT = 76         # FibRgLw97 slot 3 (base 32 + csw/RgW/cslw = 64)
_FIB_FCCLX = 418          # FibRgFcLcb97 pair 33 (base 154 + 33*8)
_FIB_LCBCLX = 422

# Word control chars -> plain text: CR is the paragraph mark, VT a soft
# line break, 0x07 ends table cells/rows; field/format markers drop.
_CTRL_MAP = {
    0x0D: "\n", 0x0B: "\n", 0x07: "\n",
    0x09: "\t",
}


# str.translate table equivalent to the old per-char loop: every
# codepoint >= 0x20 passes through untouched (translate leaves
# unmapped ordinals alone); control chars drop except the _CTRL_MAP
# substitutions and the literal \n / \t, which pass through.
_WORD_TRANSLATE = {o: None for o in range(0x20)}
_WORD_TRANSLATE[0x0A] = "\n"
_WORD_TRANSLATE[0x09] = "\t"
_WORD_TRANSLATE.update(_CTRL_MAP)


def _clean_word_text(s: str) -> str:
    # field chars (0x13/0x14/0x15), pic anchors etc -> drop
    return s.translate(_WORD_TRANSLATE).rstrip("\n")


def _pieces_from_clx(clx: bytes) -> List[Tuple[int, int, int, bool]]:
    """[(cp_start, cp_end, fc, is_unicode)] from a CLX blob.

    CLX = RgPrc (clxt=0x01 blocks, skipped) + Pcdt (clxt=0x02, lcb,
    PlcPcd).  PlcPcd = (n+1) CPs then n 8-byte PCDs; PCD.fc bit 30 set
    means compressed cp1252 at fc/2, clear means UTF-16LE at fc.
    """
    i = 0
    while i < len(clx) and clx[i] == 0x01:  # Prc: skip grpprl
        cb = _u16(clx, i + 1)
        i += 3 + cb
    if i >= len(clx) or clx[i] != 0x02:
        raise ValueError("no piece table in CLX")
    lcb = _u32(clx, i + 1)
    plc = clx[i + 5:i + 5 + lcb]
    n = (lcb - 4) // 12
    cps = [_u32(plc, 4 * k) for k in range(n + 1)]
    pieces: List[Tuple[int, int, int, bool]] = []
    for k in range(n):
        pcd_off = 4 * (n + 1) + 8 * k
        fc_raw = _u32(plc, pcd_off + 2)
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        if compressed:
            pieces.append((cps[k], cps[k + 1], fc // 2, False))
        else:
            pieces.append((cps[k], cps[k + 1], fc, True))
    return pieces


def extract_doc_text(payload: bytes) -> str:
    """Main-document text of a Word 97-2003 binary ``.doc``.

    Piece-table route (what antiword does); fcMin..fcMac fallback for
    simple documents without a usable CLX.  Output is cleaned plain
    text (paragraph marks -> newlines) to feed the E8 fenced wrap.
    """
    cf = CompoundFile(payload)
    word = cf.stream("WordDocument")
    if _u16(word, 0) != 0xA5EC:
        raise ValueError("not a Word document stream")
    flags = _u16(word, _FIB_FLAGS)
    ccp_text = _u32(word, _FIB_CCPTEXT) if len(word) > _FIB_CCPTEXT + 4 else 0

    pieces: Optional[List[Tuple[int, int, int, bool]]] = None
    if len(word) > _FIB_LCBCLX + 4:
        fc_clx = _u32(word, _FIB_FCCLX)
        lcb_clx = _u32(word, _FIB_LCBCLX)
        if lcb_clx:
            table_name = "1Table" if flags & 0x0200 else "0Table"
            try:
                table = cf.stream(table_name)
                pieces = _pieces_from_clx(table[fc_clx:fc_clx + lcb_clx])
            except (KeyError, ValueError, struct.error):
                pieces = None

    if pieces:
        parts: List[str] = []
        remaining = ccp_text if ccp_text > 0 else None
        for cp0, cp1, fc, is_uni in pieces:
            n_chars = cp1 - cp0
            if remaining is not None:
                n_chars = min(n_chars, remaining)
                if n_chars <= 0:
                    break
                remaining -= n_chars
            if is_uni:
                raw = word[fc:fc + 2 * n_chars]
                parts.append(raw.decode("utf-16-le", errors="replace"))
            else:
                raw = word[fc:fc + n_chars]
                parts.append(raw.decode("cp1252", errors="replace"))
        return _clean_word_text("".join(parts))

    # non-complex fallback: the contiguous fcMin..fcMac text window
    fc_min = _u32(word, _FIB_FCMIN)
    fc_max = _u32(word, _FIB_FCMAC)
    raw = word[fc_min:fc_max]
    if not raw:
        return ""
    # even NUL density in the high bytes betrays UTF-16LE
    if len(raw) >= 2 and raw[1::2].count(0) > len(raw) // 4:
        return _clean_word_text(raw.decode("utf-16-le", errors="replace"))
    return _clean_word_text(raw.decode("cp1252", errors="replace"))


# ---------------------------------------------------------------------------
# Fixture writer: a minimal valid .doc (CFB v3 + FIB + 1Table piece table)
# ---------------------------------------------------------------------------
_TEXT_FC = 1024  # text region offset inside the WordDocument stream


def _fib(text_chars: int, text_bytes_end: int) -> bytes:
    fib = bytearray(_TEXT_FC)
    _U16.pack_into(fib, 0, 0xA5EC)           # wIdent
    _U16.pack_into(fib, 2, 0x00C1)           # nFib (Word 97)
    _U16.pack_into(fib, _FIB_FLAGS, 0x0200)  # fWhichTblStm -> "1Table"
    _U32.pack_into(fib, _FIB_FCMIN, _TEXT_FC)
    _U32.pack_into(fib, _FIB_FCMAC, text_bytes_end)
    _U16.pack_into(fib, 32, 14)              # csw
    _U16.pack_into(fib, 62, 22)              # cslw
    _U32.pack_into(fib, 64, text_bytes_end)  # cbMac
    _U32.pack_into(fib, _FIB_CCPTEXT, text_chars)
    _U32.pack_into(fib, _FIB_FCCLX, 0)
    return bytes(fib)


def _dir_entry(name: str, obj_type: int, start: int, size: int,
               left: int = FREESECT, right: int = FREESECT,
               child: int = FREESECT) -> bytes:
    e = bytearray(128)
    enc = name.encode("utf-16-le")
    e[:len(enc)] = enc
    _U16.pack_into(e, 64, len(enc) + 2)
    e[66] = obj_type
    e[67] = 1  # black
    _U32.pack_into(e, 68, left)
    _U32.pack_into(e, 72, right)
    _U32.pack_into(e, 76, child)
    _U32.pack_into(e, 116, start)
    _U32.pack_into(e, 120, size)
    return bytes(e)


def make_min_doc_bytes(text: str, compressed: bool = False) -> bytes:
    """A minimal Word 97 ``.doc`` containing `text` as the main body.

    `compressed=True` stores the text as a cp1252 piece (PCD bit 30),
    else UTF-16LE — both PCD encodings the reader must handle.  Streams
    below the 4096-byte cutoff live in the root mini stream with a
    miniFAT (the layout real Word files use for the Table stream), so
    fixtures exercise the reader's miniFAT path; larger streams take
    regular FAT chains.
    """
    body = text + "\r"  # final paragraph mark
    if compressed:
        raw = body.encode("cp1252", errors="replace")
        fc_field = (_TEXT_FC * 2) | 0x40000000
        byte_end = _TEXT_FC + len(raw)
        n_chars = len(raw)  # CP = one byte per char in cp1252 pieces
    else:
        raw = body.encode("utf-16-le")
        fc_field = _TEXT_FC
        byte_end = _TEXT_FC + len(raw)
        n_chars = len(raw) // 2  # CP counts UTF-16 code units

    word = bytearray(_fib(n_chars, byte_end))
    word.extend(raw)

    # CLX -> Pcdt -> PlcPcd with one piece covering cp 0..n_chars
    plc = struct.pack("<II", 0, n_chars) + struct.pack(
        "<HIH", 0, fc_field, 0
    )
    clx = b"\x02" + _U32.pack(len(plc)) + plc
    _U32.pack_into(word, _FIB_FCCLX, 0)
    _U32.pack_into(word, _FIB_LCBCLX, len(clx))

    sector, mini = 512, 64
    cutoff = 4096
    streams = [("WordDocument", bytes(word)), ("1Table", clx)]

    # split streams: small ones concatenate into the mini stream
    mini_data = bytearray()
    mini_starts: Dict[str, int] = {}
    big: List[Tuple[str, bytes]] = []
    for name, data in streams:
        if len(data) < cutoff:
            mini_starts[name] = len(mini_data) // mini
            mini_data.extend(data)
            if len(mini_data) % mini:
                mini_data.extend(b"\x00" * (mini - len(mini_data) % mini))
        else:
            big.append((name, data))

    n_mini = len(mini_data) // mini
    minifat = [FREESECT] * (sector // 4)
    pos = 0
    for name, data in streams:
        if name not in mini_starts:
            continue
        n = (len(data) + mini - 1) // mini
        for i in range(n - 1):
            minifat[pos + i] = pos + i + 1
        minifat[pos + n - 1] = ENDOFCHAIN
        pos += n
    if n_mini > len(minifat):
        raise ValueError("fixture too large for single-miniFAT writer")

    # sector layout: 0=FAT, 1=directory, 2=miniFAT (if any), then big
    # streams, then the mini stream container
    has_mini = n_mini > 0
    next_sec = 2 + (1 if has_mini else 0)
    big_starts: Dict[str, int] = {}
    payload_secs: List[bytes] = []
    for name, data in big:
        n = (len(data) + sector - 1) // sector
        big_starts[name] = next_sec
        for i in range(n):
            payload_secs.append(
                data[i * sector:(i + 1) * sector].ljust(sector, b"\x00"))
        next_sec += n
    mini_start_sec = ENDOFCHAIN
    if has_mini:
        mini_start_sec = next_sec
        n = (len(mini_data) + sector - 1) // sector
        for i in range(n):
            payload_secs.append(
                bytes(mini_data[i * sector:(i + 1) * sector]).ljust(
                    sector, b"\x00"))
        next_sec += n

    fat = [FREESECT] * (sector // 4)
    fat[0] = FATSECT
    fat[1] = ENDOFCHAIN  # single directory sector
    if has_mini:
        fat[2] = ENDOFCHAIN  # single miniFAT sector
    for name, data in big:
        start = big_starts[name]
        n = (len(data) + sector - 1) // sector
        for i in range(n - 1):
            fat[start + i] = start + i + 1
        fat[start + n - 1] = ENDOFCHAIN
    if has_mini:
        n = (len(mini_data) + sector - 1) // sector
        for i in range(n - 1):
            fat[mini_start_sec + i] = mini_start_sec + i + 1
        fat[mini_start_sec + n - 1] = ENDOFCHAIN
    if next_sec > len(fat):
        raise ValueError("fixture too large for single-FAT writer")

    def _start(name: str) -> int:
        return mini_starts.get(name, big_starts.get(name, ENDOFCHAIN))

    directory = b"".join([
        _dir_entry("Root Entry", 5, mini_start_sec, len(mini_data), child=1),
        _dir_entry("WordDocument", 2, _start("WordDocument"), len(word),
                   right=2),
        _dir_entry("1Table", 2, _start("1Table"), len(clx)),
        b"\x00" * 128,
    ])

    header = bytearray(512)
    header[:8] = OLE_MAGIC
    _U16.pack_into(header, 24, 0x003E)   # minor version
    _U16.pack_into(header, 26, 0x0003)   # major version 3
    _U16.pack_into(header, 28, 0xFFFE)   # little-endian
    _U16.pack_into(header, 30, 9)        # 512-byte sectors
    _U16.pack_into(header, 32, 6)        # 64-byte mini sectors
    _U32.pack_into(header, 44, 1)        # one FAT sector
    _U32.pack_into(header, 48, 1)        # directory starts at sector 1
    _U32.pack_into(header, 56, cutoff)   # mini cutoff
    _U32.pack_into(header, 60, 2 if has_mini else ENDOFCHAIN)
    _U32.pack_into(header, 64, 1 if has_mini else 0)
    _U32.pack_into(header, 68, ENDOFCHAIN)  # no DIFAT overflow
    _U32.pack_into(header, 72, 0)
    _U32.pack_into(header, 76, 0)        # DIFAT[0] -> FAT sector 0
    for i in range(1, 109):
        _U32.pack_into(header, 76 + 4 * i, FREESECT)

    fat_sec = b"".join(_U32.pack(v) for v in fat)
    minifat_sec = b"".join(_U32.pack(v) for v in minifat) if has_mini else b""
    return bytes(header) + fat_sec + directory.ljust(sector, b"\x00") + \
        minifat_sec + b"".join(payload_secs)
