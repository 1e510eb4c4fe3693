"""Native PNG codec tests (skipped when the toolchain can't build it)."""

import io

import numpy as np
import pytest

from image_restoration_agent_tpu.core import io_native as nat
from image_restoration_agent_tpu.core.io import decode_image, encode_png

pytestmark = pytest.mark.skipif(not nat.available(),
                                reason="native codec not built")


class TestNativeCodec:
    def test_roundtrip_vs_pil(self, rng):
        from PIL import Image

        img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        dec = nat.decode_png(buf.getvalue())
        np.testing.assert_array_equal(dec, img)

        enc = nat.encode_png(img)
        back = np.asarray(Image.open(io.BytesIO(enc)).convert("RGB"))
        np.testing.assert_array_equal(back, img)

    def test_all_filter_types_decode(self, rng):
        """PIL picks adaptive per-row filters at higher effort; a gradient
        image exercises sub/up/avg/paeth rows."""
        from PIL import Image

        yy, xx = np.mgrid[0:128, 0:128]
        img = np.stack([xx, yy, (xx + yy) // 2], -1).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG", optimize=True)
        np.testing.assert_array_equal(nat.decode_png(buf.getvalue()), img)

    def test_grayscale_and_rgba(self, rng):
        from PIL import Image

        gray = (rng.random((32, 32)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(gray, mode="L").save(buf, format="PNG")
        out = nat.decode_png(buf.getvalue())
        np.testing.assert_array_equal(out[..., 0], gray)

        rgba = (rng.random((32, 32, 4)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(rgba, mode="RGBA").save(buf, format="PNG")
        out = nat.decode_png(buf.getvalue())
        np.testing.assert_array_equal(out, rgba)

    def test_io_module_uses_native_path(self, rng):
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        data = encode_png(img)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        np.testing.assert_array_equal(decode_image(data), img)

    def test_fused_normalize_pad(self, rng):
        img = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
        out = nat.u8_to_f32_pad(img, 24, 32)
        assert out.shape == (24, 32, 3)
        np.testing.assert_allclose(out[:20, :30], img / 255.0, atol=1e-7)
        assert out[20:].sum() == 0 and out[:, 30:].sum() == 0

    def test_corrupt_data_returns_none(self):
        assert nat.decode_png(b"not a png") is None
        assert nat.decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 10) is None


class TestInterlacedRejection:
    def test_interlaced_png_falls_back_to_pil(self, rng):
        """Adam7 PNGs must be rejected by the native probe (it would
        unfilter pass-ordered scanlines as sequential rows) and decoded
        correctly via the PIL fallback in decode_image."""
        import zlib
        import struct
        from PIL import Image

        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        # hand-build an interlace=1 PNG via PIL's encoder internals is not
        # supported; craft one: take PIL's sequential PNG and patch the
        # IHDR interlace byte + CRC. Content is then *not* valid Adam7 data,
        # but the probe must reject before decode ever runs.
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        data = bytearray(buf.getvalue())
        assert data[28] == 0
        data[28] = 1  # interlace = Adam7
        crc = zlib.crc32(bytes(data[12:29])) & 0xFFFFFFFF
        data[29:33] = struct.pack(">I", crc)
        assert nat.decode_png(bytes(data)) is None


class TestDecodePool:
    def test_decode_many_matches_single(self, tmp_path):
        import numpy as np

        from image_restoration_agent_tpu.core.decode_pool import DecodePool
        from image_restoration_agent_tpu.core.io import (encode_png,
                                                         load_image,
                                                         save_image)

        rng = np.random.default_rng(0)
        blobs, paths, refs = [], [], []
        for i in range(6):
            img = rng.random((20 + i, 30, 3), dtype=np.float32)
            p = tmp_path / f"im{i}.png"
            save_image(img, p)
            paths.append(p)
            blobs.append(p.read_bytes())
            refs.append(load_image(p))

        pool = DecodePool(workers=3)
        outs = pool.decode_many(blobs)
        for o, r in zip(outs, refs):
            np.testing.assert_array_equal(o, r)
        outs2 = pool.load_many(paths)
        for o, r in zip(outs2, refs):
            np.testing.assert_array_equal(o, r)

    def test_upload_validation_rejects_garbage(self, tmp_path):
        import pytest as _pytest

        from image_restoration_agent_tpu.api.server import AgentAPIServer

        app = AgentAPIServer.__new__(AgentAPIServer)
        app.work_root = tmp_path
        (tmp_path / "uploads").mkdir()
        with _pytest.raises(ValueError):
            app.save_upload("x.png", b"not an image at all")
