"""Pure-stdlib media codecs + their Spark decode paths.

Covers: PNG encode/decode roundtrips across all five scanline filters
and gray/RGB/RGBA; WAV roundtrip; Y4M roundtrip + frame sampling;
DOCX and PDF(subset) text extraction; the real-vs-stub dispatch in
extract_features (embedding verified against a numpy recomputation);
and decode_documents routing .docx/.pdf files scanned from disk
through the Arrow-batched binary decode UDF."""

import numpy as np
import pytest

from embedanything_spark import mediacodecs as mc


@pytest.mark.parametrize("shape", [(13, 17), (13, 17, 3), (9, 5, 4)])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip(shape, ft):
    rng = np.random.default_rng((hash(shape) & 0xFFFF, ft))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = mc.decode_png(mc.encode_png(img, filter_type=ft))
    assert out.shape == img.shape
    assert (out == img).all()


def test_png_rejects_non_png():
    with pytest.raises(ValueError):
        mc.decode_png(b"JFIF not a png")


def test_wav_roundtrip_mono_and_stereo():
    s = (np.sin(np.linspace(0, 100, 1600)) * 20000).astype(np.int16)
    rate, got = mc.decode_wav(mc.encode_wav(s, 8000))
    assert rate == 8000 and (got == s).all()
    st = np.random.default_rng(1).integers(
        -30000, 30000, (500, 2)).astype(np.int16)
    rate, got = mc.decode_wav(mc.encode_wav(st))
    assert got.shape == (500, 2) and (got == st).all()


def test_y4m_roundtrip_and_sampling():
    frames = np.random.default_rng(2).integers(
        0, 256, (7, 12, 16), dtype=np.uint8)
    w, h, n, samp = mc.decode_y4m(mc.encode_y4m(frames),
                                  sample_every=3)
    assert (w, h, n) == (16, 12, 7)
    assert (samp == frames[::3]).all()
    # max_frames caps without decoding the tail
    _, _, n, samp = mc.decode_y4m(mc.encode_y4m(frames),
                                  sample_every=1, max_frames=2)
    assert n == 7 and samp.shape[0] == 2


def test_docx_text():
    data = mc.make_docx(["Hello <world> & co", "second para"])
    assert mc.docx_to_text(data) == "Hello <world> & co\nsecond para"


def test_pdf_text_escapes():
    pdf = mc.make_pdf(["Hello (world)", "line \\ two"])
    assert pdf.startswith(b"%PDF")
    assert mc.pdf_to_text(pdf) == "Hello (world) line \\ two"


def test_pdf_uncompressed_stream():
    # a content stream that is NOT Flate-compressed still extracts
    raw = (b"%PDF-1.4\n1 0 obj\n<< /Length 30 >>\nstream\n"
           b"BT (plain text here) Tj ET\nendstream\nendobj\n%%EOF")
    assert mc.pdf_to_text(raw) == "plain text here"


def test_pdf_tj_array():
    content = zlib_compress(b"BT [(He) -20 (llo)] TJ ET")
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\nstream\n"
           + content + b"\nendstream\nendobj\n%%EOF")
    assert mc.pdf_to_text(pdf) == "He llo"


def zlib_compress(b):
    import zlib
    return zlib.compress(b)


# ----------------------------------------------------- Spark paths

def test_extract_features_real_embedding_matches_numpy(spark):
    from embedanything_spark.operators.multimodal import (
        extract_features, real_image_dims, synth_assets)
    feats = (extract_features(synth_assets(spark, 12, real=True))
             .toPandas().set_index("path"))
    for path, row in feats.iterrows():
        i = int(path.rsplit("/", 1)[1].split(".")[0])
        if row["modality"] == "image":
            w, h, v = real_image_dims(i)
            assert (row["width"], row["height"]) == (w, h)
            img = (np.full((h, w), v, np.uint16) +
                   np.arange(w, dtype=np.uint16)).astype(np.uint8)
            cols = np.array_split(np.arange(w), 8)
            exp = np.tile(np.array([(v + c.mean()) / 255.0
                                    for c in cols]), 8)
            exp /= np.linalg.norm(exp)
            assert np.allclose(row["embedding"], exp, atol=1e-6)
        elif row["modality"] == "audio":
            assert row["width"] == 1600 and row["height"] == 1
            assert abs(np.linalg.norm(row["embedding"]) - 1) < 1e-5
        else:
            k = 4 + i % 5
            assert row["n_frames"] == len(range(0, k, max(1, -(-k // 10))))
            assert (row["width"], row["height"]) == (24, 16)


def test_extract_features_stub_fallback_unchanged(spark):
    """Opaque payloads still go through the deterministic stub (the
    oracle contract multimodal_features depends on)."""
    from embedanything_spark.operators.multimodal import (
        _decode_image_stub, extract_features, synth_assets)
    feats = (extract_features(synth_assets(spark, 6, real=False))
             .toPandas())
    assets = synth_assets(spark, 6, real=False).toPandas() \
        .set_index("path")
    for _, row in feats.iterrows():
        w, h, vec = _decode_image_stub(
            bytes(assets.loc[row["path"], "content"]))
        assert (row["width"], row["height"]) == (w, h)
        assert np.allclose(row["embedding"], vec)


def test_decode_documents_docx_pdf_from_disk(spark, tmp_path):
    from embedanything_spark.sources import decode_documents, scan_files
    (tmp_path / "a.docx").write_bytes(
        mc.make_docx(["alpha beta", "gamma"]))
    (tmp_path / "b.pdf").write_bytes(mc.make_pdf(["delta epsilon"]))
    (tmp_path / "c.txt").write_text("plain zeta")
    files = scan_files(spark, str(tmp_path),
                       extensions=("docx", "pdf", "txt"))
    rows = {r["conv_id"].rsplit("/", 1)[1]: r["text"]
            for r in decode_documents(files).collect()}
    assert rows["a.docx"] == "alpha beta\ngamma"
    assert rows["b.pdf"] == "delta epsilon"
    assert rows["c.txt"] == "plain zeta"


def test_decode_documents_unknown_extension_still_raises(spark, tmp_path):
    from embedanything_spark.sources import decode_documents, scan_files
    (tmp_path / "x.epub").write_bytes(b"whatever")
    files = scan_files(spark, str(tmp_path), extensions=("epub",))
    with pytest.raises(NotImplementedError):
        decode_documents(files)


# ------------------------------------------------ property tests

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.sampled_from([1, 3, 4]),
       st.integers(0, 4), st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(h, w, ch, ft, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = mc.decode_png(mc.encode_png(img, filter_type=ft))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=500),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_property(samples, rate):
    s = np.array(samples, dtype=np.int16)
    got_rate, got = mc.decode_wav(mc.encode_wav(s, rate))
    assert got_rate == rate and (got == s).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 12), st.integers(1, 16), st.integers(1, 16),
       st.integers(1, 5), st.integers(0, 2**32 - 1))
def test_y4m_sampling_matches_numpy_slicing(n, h, w, step, seed):
    frames = np.random.default_rng(seed).integers(
        0, 256, (n, h, w), dtype=np.uint8)
    gw, gh, gn, samp = mc.decode_y4m(mc.encode_y4m(frames),
                                     sample_every=step)
    assert (gw, gh, gn) == (w, h, n)
    assert (samp == frames[::step]).all()


_pdf_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=40)


@settings(max_examples=40, deadline=None)
@given(st.lists(_pdf_text, min_size=1, max_size=4))
def test_pdf_roundtrip_property(lines):
    # the subset extractor joins show-ops with single spaces
    assert mc.pdf_to_text(mc.make_pdf(lines)) == " ".join(lines)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF,
                           exclude_characters="\x7f"),
    min_size=0, max_size=40), min_size=1, max_size=4))
def test_docx_roundtrip_property(paras):
    assert mc.docx_to_text(mc.make_docx(paras)) == "\n".join(paras)
