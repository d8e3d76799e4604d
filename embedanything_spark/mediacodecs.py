"""Pure-stdlib media codecs: PNG, WAV, Y4M, DOCX, PDF(subset).

The container ships no media libraries (no PIL/ffmpeg/soundfile/pypdf),
but several of the reference's decode surfaces are implementable with
nothing beyond the standard library + numpy:

- PNG  — zlib inflate + per-row unfilter (the format IS zlib + filters);
  encoder + decoder, 8-bit gray/RGB/RGBA, all five filter types.
  Reference: CLIP/ColPali image ingest (``rust/src/lib.rs:546-550``).
- WAV  — stdlib ``wave`` over BytesIO, 16-bit PCM mono/stereo.
  Reference: whisper audio ingest
  (``rust/src/file_processor/audio/audio_processor.rs``).
- Y4M  — YUV4MPEG2 (plain-text header + raw frames), mono plane;
  real frame sampling for the video path
  (``processors/src/video_processor.rs:1-145``).
- DOCX — a .docx is a zip holding ``word/document.xml``; stdlib
  ``zipfile`` + ``xml.etree`` text extraction, paragraph-per-line
  (``processors/src/docx_processor.rs:19-40`` does exactly this via
  the docx crate).
- PDF  — SUBSET text extractor: FlateDecode (zlib) content streams,
  literal-string ``Tj`` / ``TJ`` operators with escape + octal
  handling. Covers simply-generated PDFs (the common case for
  machine-produced corpora); scanned/CID/encrypted PDFs need a real
  lib — that seam stays documented
  (``processors/src/pdf/pdf_processor.rs:43-100``).

Everything here is per-item bytes→value kernels, called from inside
Arrow-batched ``mapInPandas``/pandas-UDF loops (the same batch shape as
the reference's per-item decode kernels) — never from per-row Python
UDFs.
"""

from __future__ import annotations

import io
import re
import struct
import wave
import zipfile
import zlib
from xml.etree import ElementTree

import numpy as np

# ---------------------------------------------------------------- PNG

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer: uint8 array (h,w) gray, (h,w,3) RGB or
    (h,w,4) RGBA; every scanline uses ``filter_type`` (0-4 — non-zero
    types exist to exercise the decoder's unfilter paths)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
        arr = arr[:, :, None]
    elif arr.shape[2] == 3:
        color, ch = 2, 3
    elif arr.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w = arr.shape[:2]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        line = arr[y].reshape(-1)
        raw.append(filter_type)
        raw.extend(_png_filter(line, prev, ch, filter_type).tobytes())
        prev = line

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload +
                struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(bytes(raw))) +
            chunk(b"IEND", b""))


def _png_filter(line: np.ndarray, prev: np.ndarray, ch: int,
                ft: int) -> np.ndarray:
    """Apply scanline filter ft (spec section 9) for the encoder."""
    if ft == 0:
        return line
    a = np.zeros_like(line)
    a[ch:] = line[:-ch]            # left
    b = prev                        # up
    c = np.zeros_like(line)
    c[ch:] = prev[:-ch]            # upper-left
    i16 = line.astype(np.int16)
    if ft == 1:
        return (i16 - a).astype(np.uint8)
    if ft == 2:
        return (i16 - b).astype(np.uint8)
    if ft == 3:
        return (i16 - ((a.astype(np.int16) + b) // 2)).astype(np.uint8)
    if ft == 4:
        return (i16 - _paeth(a, b, c)).astype(np.uint8)
    raise ValueError(f"bad filter {ft}")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    a, b, c = (x.astype(np.int16) for x in (a, b, c))
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a,
                    np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array (h,w) for gray, (h,w,ch) otherwise. Supports
    bit depth 8, color types gray/RGB/RGBA, no interlace."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = bytearray()
    color = ch = h = 0
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color not in _CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace})")
            ch = _CHANNELS[color]
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if ft == 0:
            pass
        elif ft == 2:
            line += prev
        elif ft in (1, 3, 4):
            # left-dependent: sequential over pixels, vector over channels
            up = prev.reshape(w, ch).astype(np.int16)
            cur = line.reshape(w, ch).astype(np.int16)
            left = np.zeros(ch, dtype=np.int16)
            ul = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                if ft == 1:
                    cur[x] = (cur[x] + left) & 0xFF
                elif ft == 3:
                    cur[x] = (cur[x] + (left + up[x]) // 2) & 0xFF
                else:
                    cur[x] = (cur[x] + _paeth(left, up[x], ul)) & 0xFF
                left, ul = cur[x], up[x]
            line = cur.astype(np.uint8).reshape(-1)
        else:
            raise ValueError(f"bad filter {ft}")
        out[y] = line
        prev = out[y]
    out = out.reshape(h, w, ch)
    return out[:, :, 0] if ch == 1 else out


# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 samples, (n,) mono or (n, ch) → RIFF/WAVE bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    nch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (rate, int16 samples (n,) or (n, ch))."""
    with wave.open(io.BytesIO(data), "rb") as f:
        rate = f.getframerate()
        nch = f.getnchannels()
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        arr = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)
    return rate, (arr if nch == 1 else arr.reshape(-1, nch))


# ---------------------------------------------------------------- Y4M

Y4M_SIG = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """uint8 frames (n, h, w) (mono plane, ``Cmono``) → YUV4MPEG2."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n"
                    .encode())
    for i in range(n):
        out.extend(b"FRAME\n")
        out.extend(frames[i].tobytes())
    return bytes(out)


def decode_y4m(data: bytes, sample_every: int = 1,
               max_frames: int | None = None) -> tuple[int, int, int, np.ndarray]:
    """YUV4MPEG2 (mono) → (width, height, total_frames, sampled frames
    (k,h,w)). ``sample_every``/``max_frames`` give real frame-sampling
    semantics (every Nth frame, cap) without decoding skipped frames'
    pixels — only the Y-plane byte offsets advance."""
    if not data.startswith(Y4M_SIG):
        raise ValueError("not a y4m stream")
    hdr_end = data.index(b"\n")
    w = h = 0
    for tok in data[len(Y4M_SIG):hdr_end].split():
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C") and tok != b"Cmono":
            raise ValueError(f"unsupported colorspace {tok!r}")
    frame_bytes = w * h
    pos, total, sampled = hdr_end + 1, 0, []
    while pos < len(data):
        nl = data.index(b"\n", pos)      # FRAME [params]\n
        if not data[pos:nl].startswith(b"FRAME"):
            raise ValueError("bad frame marker")
        start = nl + 1
        if total % sample_every == 0 and \
                (max_frames is None or len(sampled) < max_frames):
            sampled.append(np.frombuffer(
                data, np.uint8, frame_bytes, start).reshape(h, w))
        pos = start + frame_bytes
        total += 1
    return w, h, total, (np.stack(sampled) if sampled
                         else np.zeros((0, h, w), np.uint8))


# --------------------------------------------------------------- DOCX

def docx_to_text(data: bytes) -> str:
    """word/document.xml text runs, one line per paragraph
    (docx_processor.rs:19-40 — same unzip-and-walk)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        xml = z.read("word/document.xml")
    root = ElementTree.fromstring(xml)
    ns = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
    paras = []
    for p in root.iter(f"{ns}p"):
        runs = [t.text or "" for t in p.iter(f"{ns}t")]
        if runs:
            paras.append("".join(runs))
    return "\n".join(paras)


def make_docx(paragraphs: list[str]) -> bytes:
    """Author a minimal valid .docx (tests + datagen — the inverse of
    ``docx_to_text``)."""
    ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{_xml_escape(p)}</w:t>"
        f"</w:r></w:p>" for p in paragraphs)
    doc = (f"<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
           f"<w:document xmlns:w=\"{ns}\"><w:body>{body}</w:body>"
           f"</w:document>")
    types = ("<?xml version=\"1.0\"?><Types xmlns=\"http://schemas."
             "openxmlformats.org/package/2006/content-types\">"
             "<Default Extension=\"xml\" ContentType=\"application/xml\"/>"
             "</Types>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", types)
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


# ---------------------------------------------------------------- PDF

_DICT_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
# (?!\d) pins the capture to the FULL integer before testing the
# indirect-ref lookahead — without it, backtracking shrinks \d+ until
# '/Length 12 0 R' "matches" with a bogus direct length of 1.
_LENGTH_DIRECT_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_ENDSTREAM_RE = re.compile(rb"endstream")
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_TJA_RE = re.compile(rb"\[((?:[^\]\\]|\\.)*)\]\s*TJ", re.DOTALL)
_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_ESC_RE = re.compile(rb"\\([0-7]{1,3}|.)")


def _unescape_pdf_string(b: bytes) -> bytes:
    def sub(m: re.Match) -> bytes:
        g = m.group(1)
        if g.isdigit() and all(c in b"01234567" for c in g):
            return bytes([int(g, 8) & 0xFF])
        return {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                b"f": b"\f"}.get(g, g)
    return _ESC_RE.sub(sub, b)


def _looks_like_content_ops(raw: bytes) -> bool:
    """Plausibility check for an UNCOMPRESSED content stream: real
    page content carries text/graphics operators."""
    return any(op in raw for op in (b"Tj", b"TJ", b"BT", b" Td", b" re"))


def pdf_to_text(data: bytes) -> str:
    """SUBSET PDF text extraction: slice each stream body by the
    preceding object dict's direct ``/Length`` (so compressed bytes
    that happen to contain the literal ``endstream`` never truncate —
    the non-greedy-regex failure mode), falling back to an
    ``endstream`` scan only when ``/Length`` is absent or indirect
    (``N 0 R``); inflate FlateDecode streams, then collect
    literal-string ``Tj`` and ``TJ``-array show operators in document
    order. A stream that fails inflate is SKIPPED unless it plausibly
    looks like plain content-stream operators (never emit inflate
    garbage as text). Handles \\-escapes and octal codes, Latin-1
    decoding. Honest limits: no CID/Type0 composite fonts, no hex
    strings, no encryption, no layout reconstruction — swap in a real
    PDF lib for those (pdf_processor.rs:43-100)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    pieces: list[bytes] = []
    for m in _DICT_STREAM_RE.finditer(data):
        start = m.end()
        # the lazy <<(.*?)>> can span several objects between two
        # streams; only the dict ADJACENT to this stream (after the
        # last '<<') may supply its /Length — an earlier unrelated
        # object's /Length would slice the wrong span.
        g = m.group(1)
        g = g[g.rfind(b"<<") + 2:] if b"<<" in g else g
        lm = _LENGTH_DIRECT_RE.search(g)
        raw = None
        if lm:
            n = int(lm.group(1))
            tail = data[start + n:start + n + 16]
            if _ENDSTREAM_RE.search(tail):  # length is consistent
                raw = data[start:start + n]
        if raw is None:  # no/indirect /Length → legacy scan
            em = _ENDSTREAM_RE.search(data, start)
            if not em:
                continue
            raw = data[start:em.start()].rstrip(b"\r\n")
        try:
            content = zlib.decompress(raw)
        except zlib.error:
            if not _looks_like_content_ops(raw):
                continue
            content = raw
        for tm in _TJ_RE.finditer(content):
            pieces.append(_unescape_pdf_string(tm.group(1)))
        for am in _TJA_RE.finditer(content):
            for sm in _STR_RE.finditer(am.group(1)):
                pieces.append(_unescape_pdf_string(sm.group(1)))
    return b" ".join(pieces).decode("latin-1")


def make_pdf(lines: list[str]) -> bytes:
    """Author a minimal one-page PDF with a Flate-compressed content
    stream (tests + datagen — the shape machine-generated PDFs use)."""
    def esc(s: str) -> str:
        return (s.replace("\\", r"\\").replace("(", r"\(")
                .replace(")", r"\)"))
    ops = ["BT /F1 12 Tf 72 720 Td"]
    for i, ln in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({esc(ln)}) Tj")
    ops.append("ET")
    content = zlib.compress(" ".join(ops).encode("latin-1"))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() +
        b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out.extend(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref_at = len(out)
    out.extend(f"xref\n0 {len(objs) + 1}\n".encode())
    out.extend(b"0000000000 65535 f \n")
    for off in offsets:
        out.extend(f"{off:010d} 00000 n \n".encode())
    out.extend(f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
               f"startxref\n{xref_at}\n%%EOF\n".encode())
    return bytes(out)
