"""Real-decode dispatch for the multimodal tier (r4 review finding: the
pillow/soundfile impls used to silently fall through to the digest-derived
fake — on a machine WITH the library the API returned garbage labeled as a
real decode).  These tests pin the dispatch: each impl maps to its own row
function, the library-backed ones really call the library (verified with a
monkeypatched fake module), and absence raises NotImplementedError at plan
time.  Pillow-golden tests run only where Pillow exists (skipped here)."""

import io
import struct
import sys
import types

import pytest

from solr_map_reduce_spark.extensions import multimodal
from solr_map_reduce_spark.extensions.multimodal import (
    AUDIO_DECODERS,
    IMAGE_DECODERS,
    PIXEL_IMPLS,
    RESIZE_IMPLS,
    _builtin_image_meta,
    _builtin_pixel_row,
    _fake_image_row,
    _netpbm_pixels,
    _pillow_image_row,
    _pillow_resize_row,
    _soundfile_audio_row,
)


class _FakeImage:
    width, height, mode, format = 640, 480, "RGB", "TIFF"

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def convert(self, _mode):
        return self

    def resize(self, size, resample=None):
        img = _FakeImage()
        img.width, img.height = size
        return img

    def save(self, buf, format=None):
        buf.write(b"resized-by-fake-pil:" + format.encode())

    def getextrema(self):
        return (3, 250)


def _install_fake_pil(monkeypatch):
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda buf: _FakeImage()
    image_mod.BILINEAR = 2
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    return pil


class TestDispatchTables:
    """Every impl name maps to ITS OWN row function — no fallthrough."""

    def test_image_decoders_distinct(self):
        assert IMAGE_DECODERS["pillow"] is _pillow_image_row
        assert IMAGE_DECODERS["fake"] is _fake_image_row
        assert len({id(f) for f in IMAGE_DECODERS.values()}) == 3

    def test_audio_decoders_distinct(self):
        assert AUDIO_DECODERS["soundfile"] is _soundfile_audio_row
        assert len({id(f) for f in AUDIO_DECODERS.values()}) == 3

    def test_resize_and_pixel_distinct(self):
        assert RESIZE_IMPLS["pillow"] is _pillow_resize_row
        assert len({id(f) for f in RESIZE_IMPLS.values()}) == 2
        assert len({id(f) for f in PIXEL_IMPLS.values()}) == 3


class TestMonkeypatchedPillow:
    """With a fake PIL module installed, the pillow row functions must
    return what PIL reports — never digest-derived metadata."""

    def test_image_meta_comes_from_pil(self, monkeypatch):
        _install_fake_pil(monkeypatch)
        got = _pillow_image_row(b"anything-at-all")
        assert got == (640, 480, "RGB", "TIFF")
        # and is NOT what the fake (digest) impl would have produced
        assert got != _fake_image_row(b"anything-at-all")

    def test_resize_reencodes_through_pil(self, monkeypatch):
        _install_fake_pil(monkeypatch)
        content, w, h = _pillow_resize_row(b"payload", 224, 128)
        assert (w, h) == (224, 128)
        assert content == b"resized-by-fake-pil:TIFF"  # NOT a passthrough

    def test_plan_time_guard_accepts_fake_pil(self, monkeypatch, spark):
        _install_fake_pil(monkeypatch)
        df = spark.createDataFrame(
            [("m1", bytearray(b"x"))], "media_id string, content binary"
        )
        out = multimodal.decode_image(df, impl="pillow")  # no raise
        assert set(out.columns) == {
            "media_id", "width", "height", "mode", "format", "n_bytes",
        }

    def test_pixel_stats_come_from_pil(self, monkeypatch):
        _install_fake_pil(monkeypatch)
        pil = sys.modules["PIL"]
        stat_mod = types.ModuleType("PIL.ImageStat")

        class _Stat:
            def __init__(self, img):
                self.mean = [127.5]
                self.stddev = [10.25]

        stat_mod.Stat = _Stat
        pil.ImageStat = stat_mod
        monkeypatch.setitem(sys.modules, "PIL.ImageStat", stat_mod)
        from solr_map_reduce_spark.extensions.multimodal import _pillow_pixel_row

        assert _pillow_pixel_row(b"img") == (127.5, 10.25, 3.0, 250.0)


class TestMonkeypatchedSoundfile:
    def test_audio_meta_comes_from_soundfile(self, monkeypatch):
        sf = types.ModuleType("soundfile")

        class _Info:
            samplerate, channels, duration = 44100, 2, 12.345678
            subtype, format = "PCM_24", "FLAC"

        sf.info = lambda buf: _Info()
        monkeypatch.setitem(sys.modules, "soundfile", sf)
        assert _soundfile_audio_row(b"audio-bytes") == (44100, 2, 12.345678, "pcm_24")


class TestMissingLibraryRaises:
    """In THIS environment neither Pillow nor soundfile is installed: the
    library impls must raise NotImplementedError at plan time — the old
    bug only raised when absent but fell through to fake when present."""

    def test_absent_raises_for_every_entry_point(self, spark):
        if "PIL" in sys.modules:
            pytest.skip("Pillow installed here; absence path not testable")
        df = spark.createDataFrame(
            [("m1", bytearray(b"x"))], "media_id string, content binary"
        )
        for call in (
            lambda: multimodal.decode_image(df, impl="pillow"),
            lambda: multimodal.resize_image(df, 8, 8, impl="pillow"),
            lambda: multimodal.pixel_features(df, impl="pillow"),
        ):
            with pytest.raises(NotImplementedError):
                call()

    def test_soundfile_absent_raises(self, spark):
        if "soundfile" in sys.modules:
            pytest.skip("soundfile installed here")
        df = spark.createDataFrame(
            [("a1", bytearray(b"x"))], "media_id string, content binary"
        )
        with pytest.raises(NotImplementedError):
            multimodal.decode_audio(df, impl="soundfile")


def _p6(w, h, pixels):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(pixels)


class TestBuiltinPixelStats:
    """pixel_features(impl='builtin'): REAL pixel values from uncompressed
    netpbm — exact golden statistics, no codec library anywhere."""

    def test_p6_exact_stats(self, spark):
        # 2x1 RGB: pixels (0,0,0) and (255,255,255) -> mean 127.5, std 127.5
        img = _p6(2, 1, [0, 0, 0, 255, 255, 255])
        df = spark.createDataFrame(
            [("i1", bytearray(img)), ("i2", bytearray(b"not-an-image")), ("i3", None)],
            "media_id string, content binary",
        )
        out = {
            r["media_id"]: r
            for r in multimodal.pixel_features(df, impl="builtin").collect()
        }
        assert out["i1"]["px_mean"] == 127.5
        assert out["i1"]["px_std"] == 127.5
        assert (out["i1"]["px_min"], out["i1"]["px_max"]) == (0.0, 255.0)
        assert out["i2"]["px_mean"] is None and out["i3"]["px_mean"] is None

    def test_p2_ascii_with_comment(self):
        img = b"P2\n# a comment\n3 1\n255\n10 20 30\n"
        assert _netpbm_pixels(img) == [10, 20, 30]
        mean, std, lo, hi = _builtin_pixel_row(img)
        assert (mean, lo, hi) == (20.0, 10.0, 30.0)

    def test_p5_16bit(self):
        img = b"P5\n2 1\n65535\n" + struct.pack(">HH", 1000, 3000)
        assert _netpbm_pixels(img) == [1000, 3000]

    def test_truncated_binary_rejected(self):
        assert _netpbm_pixels(b"P6\n4 4\n255\n\x00\x01") is None


class TestBmpCoreHeader:
    def test_core_header_dimensions_unsigned(self):
        # BITMAPCOREHEADER (dib=12) stores unsigned 16-bit dims: 40000 wide
        # must NOT come back negative (r4 advice)
        b = b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + struct.pack("<HH", 40000, 33000)
        b += b"\x00" * (26 - len(b) if len(b) < 26 else 0)
        w, h, mode, fmt = _builtin_image_meta(b)
        assert (w, h, fmt) == (40000, 33000, "BMP")


class TestPillowGolden:
    """Real-codec goldens — run only where Pillow is actually installed."""

    @pytest.fixture()
    def pil(self):
        return pytest.importorskip("PIL.Image")

    def test_png_roundtrip_decode_and_resize(self, pil, spark):
        img = pil.new("RGB", (32, 16), color=(10, 200, 30))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        payload = buf.getvalue()
        df = spark.createDataFrame(
            [("p1", bytearray(payload))], "media_id string, content binary"
        )
        meta = multimodal.decode_image(df, impl="pillow").collect()[0]
        assert (meta["width"], meta["height"], meta["format"]) == (32, 16, "PNG")
        resized = multimodal.resize_image(df, 8, 8, impl="pillow").collect()[0]
        assert (resized["width"], resized["height"]) == (8, 8)
        with pil.open(io.BytesIO(bytes(resized["content"]))) as out_img:
            assert out_img.size == (8, 8)
        stats = multimodal.pixel_features(df, impl="pillow").collect()[0]
        assert stats["px_std"] == 0.0  # solid color: zero variance
