"""Native C++ host codec: bit-exactness against the NumPy golden coder
(the reference's CPU coders are its oracle; ours must match ours)."""
import numpy as np
import pytest

from gpujpeg_tpu import native
from gpujpeg_tpu.models.encoder import Encoder
from gpujpeg_tpu.ops import golden
from gpujpeg_tpu.params import ImageParameters, Parameters
from gpujpeg_tpu.plan import make_plan
from gpujpeg_tpu.tables import default_huffman_table
from gpujpeg_tpu.types import ColorSpace, ComponentType, HuffmanType, PixelFormat

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="no C++ compiler available")


def _tables(plan):
    dc = [default_huffman_table(c.comp_type, HuffmanType.DC)
          for c in plan.components]
    ac = [default_huffman_table(c.comp_type, HuffmanType.AC)
          for c in plan.components]
    return dc, ac


@pytest.mark.parametrize("interleaved,ri", [(False, 0), (False, 3), (True, 2)])
def test_native_encode_matches_golden(rng, interleaved, ri):
    image = ImageParameters(width=48, height=32, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    params = Parameters(quality=75, restart_interval=ri, interleaved=interleaved)
    plan = make_plan(params, image)
    # adversarial coefficients: sparse + extremes, exercises ZRL/EOB/big cats
    coeff = rng.integers(-40, 40, (plan.n_blocks, 64)).astype(np.int32)
    coeff[rng.random((plan.n_blocks, 64)) < 0.85] = 0
    coeff[0, 0] = 1023
    coeff[1, 63] = -1023
    dc, ac = _tables(plan)
    ref = golden.encode_segments(plan, coeff, dc, ac)
    nat = native.encode_segments_native(plan, coeff, dc, ac)
    assert nat is not None
    assert len(nat) == len(ref)
    for a, b in zip(nat, ref):
        assert a == b


@pytest.mark.parametrize("interleaved,ri", [(False, 0), (False, 3), (True, 2)])
def test_native_decode_round_trip(rng, interleaved, ri):
    image = ImageParameters(width=48, height=32, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    params = Parameters(quality=75, restart_interval=ri, interleaved=interleaved)
    plan = make_plan(params, image)
    coeff = rng.integers(-100, 100, (plan.n_blocks, 64)).astype(np.int32)
    coeff[rng.random((plan.n_blocks, 64)) < 0.8] = 0
    dc, ac = _tables(plan)
    seg_bytes = golden.encode_segments(plan, coeff, dc, ac)

    # lay segments out per scan like the stream reader would
    scan_data, segments_by_scan = [], []
    si = 0
    for scan in plan.scans:
        parts, segs, pos = [], [], 0
        for _ in range(scan.segment_count):
            b = seg_bytes[si]
            si += 1
            parts.append(np.frombuffer(b, np.uint8))
            segs.append((pos, pos + len(b)))
            pos += len(b)
        scan_data.append(np.concatenate(parts) if parts else np.zeros(0, np.uint8))
        segments_by_scan.append(segs)

    ref = golden.decode_segments(plan, scan_data, segments_by_scan, dc, ac)
    nat = native.decode_segments_native(plan, scan_data, segments_by_scan, dc, ac)
    assert nat is not None
    np.testing.assert_array_equal(nat, ref)
    np.testing.assert_array_equal(nat, coeff)


def test_native_decode_corrupt_stream_no_crash():
    image = ImageParameters(width=32, height=32, color_space=ColorSpace.RGB,
                            pixel_format=PixelFormat.PF_444_U8_P012)
    plan = make_plan(Parameters(restart_interval=2), image)
    dc, ac = _tables(plan)
    garbage = np.frombuffer(bytes(range(256)) * 4, np.uint8)
    segs = [[(0, 256)] for _ in plan.scans]
    out = native.decode_segments_native(
        plan, [garbage] * len(plan.scans), segs, dc, ac)
    assert out is not None
    assert out.shape == (plan.n_blocks, 64)
