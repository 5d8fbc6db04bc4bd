"""CLI parity tests (reference: src/main.c flows; regression analog:
test/regression/run_tests.sh)."""
import io

import numpy as np
import pytest
from PIL import Image

from gpujpeg_tpu import cli
from gpujpeg_tpu.params import ImageParameters
from gpujpeg_tpu.types import PixelFormat
from gpujpeg_tpu.utils import image_io

from conftest import make_test_rgb, psnr


def _write_ppm(path, img):
    H, W = img.shape[:2]
    image_io.save_image(str(path), img.reshape(-1), ImageParameters(
        width=W, height=H, pixel_format=PixelFormat.PF_444_U8_P012))


def test_cli_encode_decode_round_trip(tmp_path):
    img = make_test_rgb(48, 64)
    src = tmp_path / "in.ppm"
    jpg = tmp_path / "out.jpg"
    dst = tmp_path / "back.ppm"
    _write_ppm(src, img)

    # encode auto-detected from .jpg extension; golden backend = host path
    assert cli.main(["-b", "golden", str(src), str(jpg)]) == 0
    pil = np.asarray(Image.open(jpg).convert("RGB"))
    assert psnr(img, pil) > 30

    assert cli.main(["-b", "golden", str(jpg), str(dst)]) == 0
    back, info = image_io.load_image(str(dst))
    assert (info.width, info.height) == (64, 48)
    assert psnr(img, back.reshape(48, 64, 3)) > 30


def test_cli_quality_and_subsampling(tmp_path):
    img = make_test_rgb(32, 32)
    src = tmp_path / "in.ppm"
    _write_ppm(src, img)
    lo = tmp_path / "lo.jpg"
    hi = tmp_path / "hi.jpg"
    assert cli.main(["-b", "golden", "-q", "20", "-S", "420",
                     str(src), str(lo)]) == 0
    assert cli.main(["-b", "golden", "-q", "95",
                     str(src), str(hi)]) == 0
    assert lo.stat().st_size < hi.stat().st_size


def test_cli_raw_rgb_needs_size(tmp_path, capsys):
    raw = tmp_path / "in.rgb"
    raw.write_bytes(bytes(16 * 16 * 3))
    out = tmp_path / "o.jpg"
    # no size -> error
    assert cli.main(["-b", "golden", str(raw), str(out)]) == 1
    # with size -> ok
    assert cli.main(["-b", "golden", "-s", "16x16", str(raw), str(out)]) == 0


def test_cli_info_jpeg(tmp_path, capsys):
    img = make_test_rgb(32, 48)
    src = tmp_path / "in.ppm"
    jpg = tmp_path / "x.jpg"
    _write_ppm(src, img)
    assert cli.main(["-b", "golden", "-r", "4", "-g", str(src), str(jpg)]) == 0
    capsys.readouterr()
    assert cli.main(["-I", str(jpg)]) == 0
    out = capsys.readouterr().out
    assert "width: 48" in out
    assert "height: 32" in out
    assert "segment count" in out


def test_cli_component_range(tmp_path, capsys):
    img = make_test_rgb(16, 16)
    src = tmp_path / "in.ppm"
    _write_ppm(src, img)
    assert cli.main(["-R", str(src), str(tmp_path / "ignored.jpg")]) == 0
    out = capsys.readouterr().out
    assert "component #0" in out and "component #2" in out


def test_cli_convert(tmp_path):
    img = make_test_rgb(16, 16)
    src = tmp_path / "in.ppm"
    dst = tmp_path / "out.rgb"
    _write_ppm(src, img)
    assert cli.main(["-C", str(src), str(dst)]) == 0
    raw = np.fromfile(dst, np.uint8)
    np.testing.assert_array_equal(raw, img.reshape(-1))


def test_cli_missing_files():
    assert cli.main([]) == 2
    assert cli.main(["one.ppm"]) == 2


def test_cli_y4m_video_batch(tmp_path):
    """Y4M multi-frame batch encode via %d output pattern (reference
    video flow, BASELINE config 5 surface)."""
    from gpujpeg_tpu.utils.image_io import Y4mInfo, y4m_write
    H, W = 32, 48
    frames = [make_test_rgb(H, W, seed=s) for s in range(3)]
    # 4:4:4 Y4M from RGB channels treated as planes is enough for the
    # CLI plumbing check (each frame planar 444)
    info = Y4mInfo(width=W, height=H, subsampling=444)
    planar = [np.concatenate([f[:, :, 0].ravel(), f[:, :, 1].ravel(),
                              f[:, :, 2].ravel()]) for f in frames]
    src = tmp_path / "in.y4m"
    src.write_bytes(y4m_write(info, planar))

    out = tmp_path / "frame_%02d.jpg"
    assert cli.main(["-b", "golden", str(src), str(out)]) == 0
    for i in range(3):
        p = tmp_path / ("frame_%02d.jpg" % i)
        assert p.exists() and p.stat().st_size > 100
        Image.open(p)   # parseable by an independent decoder


def test_cli_decode_frame_sequence(tmp_path):
    """%d input pattern decodes a frame sequence through the pipelined
    batch path (mirror of the Y4M encode batch)."""
    H, W = 32, 48
    frames = [make_test_rgb(H, W, seed=s) for s in range(3)]
    for i, f in enumerate(frames):
        src = tmp_path / f"in_{i}.ppm"
        _write_ppm(src, f)
        assert cli.main(["-b", "golden", str(src),
                         str(tmp_path / ("f_%02d.jpg" % i))]) == 0
    out = tmp_path / "back_%02d.ppm"
    assert cli.main(["-b", "golden", str(tmp_path / "f_%02d.jpg"),
                     str(out)]) == 0
    for i, f in enumerate(frames):
        back, info = image_io.load_image(str(tmp_path / ("back_%02d.ppm" % i)))
        assert psnr(f, back.reshape(H, W, 3)) > 30

def test_cli_decode_percent_in_filename(tmp_path):
    """A literal '%' in a filename is not a frame pattern — the file
    must decode normally (only printf-style %d specifiers trigger the
    batch path)."""
    img = make_test_rgb(16, 16)
    src = tmp_path / "in.ppm"
    _write_ppm(src, img)
    jpg = tmp_path / "photo%20b.jpg"
    assert cli.main(["-b", "golden", str(src), str(jpg)]) == 0
    dst = tmp_path / "out%20b.ppm"
    assert cli.main(["-b", "golden", str(jpg), str(dst)]) == 0
    back, info = image_io.load_image(str(dst))
    assert psnr(img, back.reshape(16, 16, 3)) > 30


def test_cli_decode_one_based_frame_sequence(tmp_path):
    """ffmpeg-style 1-based %d sequences decode (discovery probes both
    0- and 1-based starts)."""
    frames = [make_test_rgb(16, 16, seed=s) for s in range(2)]
    for i, f in enumerate(frames):
        src = tmp_path / f"in{i}.ppm"
        _write_ppm(src, f)
        assert cli.main(["-b", "golden", str(src),
                         str(tmp_path / ("g_%d.jpg" % (i + 1)))]) == 0
    assert cli.main(["-b", "golden", str(tmp_path / "g_%d.jpg"),
                     str(tmp_path / "h_%d.ppm")]) == 0
    for i, f in enumerate(frames):
        back, _ = image_io.load_image(str(tmp_path / ("h_%d.ppm" % i)))
        assert psnr(f, back.reshape(16, 16, 3)) > 30


def test_cli_decode_batch_needs_dst_pattern(tmp_path, capsys):
    """Multiple input frames with a single (non-pattern) destination is
    an error, not a silent last-frame-wins overwrite."""
    for i in range(2):
        src = tmp_path / f"i{i}.ppm"
        _write_ppm(src, make_test_rgb(16, 16, seed=i))
        assert cli.main(["-b", "golden", str(src),
                         str(tmp_path / ("j_%d.jpg" % i))]) == 0
    rc = cli.main(["-b", "golden", str(tmp_path / "j_%d.jpg"),
                   str(tmp_path / "single.ppm")])
    assert rc == 1
    assert "no %d pattern" in capsys.readouterr().err
