"""Native frame sink tests: build, write, decode roundtrip, backpressure."""

import numpy as np
import pytest

from spacetime_tpu.utils.framesink import FrameSink


def test_framesink_roundtrip(tmp_path, rng):
    w, h = 64, 48
    frame = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    with FrameSink(str(tmp_path), w, h, workers=2) as sink:
        assert sink.native, "native framesink failed to build"
        for i in range(5):
            sink.submit(i, frame)
    from PIL import Image

    files = sorted(tmp_path.glob("frame_*.png"))
    assert len(files) == 5
    decoded = np.asarray(Image.open(files[0]))
    assert decoded.shape == (h, w, 3)
    want = (np.clip(frame, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(decoded, want)


def test_framesink_uint8_and_order(tmp_path):
    w, h = 16, 16
    with FrameSink(str(tmp_path), w, h, workers=1, queue_capacity=2) as sink:
        for i in range(20):  # exceeds queue capacity -> backpressure path
            frame = np.full((h, w, 3), i * 10 % 256, np.uint8)
            sink.submit(i, frame)
    files = sorted(tmp_path.glob("frame_*.png"))
    assert len(files) == 20
    from PIL import Image

    img7 = np.asarray(Image.open(tmp_path / "frame_00000007.png"))
    assert (img7 == 70).all()


def test_framesink_shape_check(tmp_path):
    sink = FrameSink(str(tmp_path), 8, 8)
    with pytest.raises(AssertionError):
        sink.submit(0, np.zeros((4, 4, 3), np.uint8))
    sink.close()
