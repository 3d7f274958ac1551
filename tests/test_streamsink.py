"""HTTP MJPEG live-view sink: native server end-to-end over a real socket."""

import io
import socket
import time

import numpy as np
import pytest

from spacetime_tpu.utils.streamsink import StreamSink


def _read_headers(sock_file):
    headers = {}
    status = sock_file.readline().decode()
    while True:
        line = sock_file.readline().decode()
        if line in ("\r\n", "\n", ""):
            break
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers


def _read_part(sock_file):
    """Read one multipart frame: boundary line, part headers, JPEG bytes."""
    while True:
        line = sock_file.readline()
        if not line:
            raise AssertionError("stream closed before a part arrived")
        if line.strip().startswith(b"--spacetimeframe"):
            break
    headers = {}
    while True:
        line = sock_file.readline().decode()
        if line in ("\r\n", "\n"):
            break
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    n = int(headers["content-length"])
    data = sock_file.read(n)
    assert len(data) == n
    return headers, data


@pytest.fixture(scope="module")
def sink():
    s = StreamSink(port=0, width=64, height=48, quality=90)
    yield s
    s.close()


def test_native_build(sink):
    # g++ and libjpeg are in the image: the native path must engage
    assert sink.native


def test_index_page(sink):
    with socket.create_connection(("127.0.0.1", sink.port), timeout=5) as c:
        c.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        f = c.makefile("rb")
        status, headers = _read_headers(f)
        assert "200" in status
        body = f.read(int(headers["content-length"]))
        assert b"/stream" in body


def test_stream_delivers_submitted_frame(sink):
    rgb = np.zeros((48, 64, 3), np.uint8)
    rgb[:, :32] = (255, 0, 0)  # left half red
    rgb[:, 32:] = (0, 0, 255)  # right half blue

    with socket.create_connection(("127.0.0.1", sink.port), timeout=5) as c:
        c.sendall(b"GET /stream HTTP/1.1\r\nHost: x\r\n\r\n")
        f = c.makefile("rb")
        status, headers = _read_headers(f)
        assert "200" in status
        assert "multipart/x-mixed-replace" in headers["content-type"]

        # submit a few frames (latest-wins slot: keep submitting until the
        # encoder has published one)
        deadline = time.time() + 10
        while sink.frames_encoded == 0 and time.time() < deadline:
            sink.submit(rgb)
            time.sleep(0.02)
        part_headers, data = _read_part(f)
        assert part_headers["content-type"] == "image/jpeg"
        assert data[:2] == b"\xff\xd8"  # JPEG SOI

        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert img.shape == (48, 64, 3)
        # JPEG is lossy: check the halves' dominant channels
        left, right = img[:, :28], img[:, 36:]
        assert left[..., 0].mean() > 180 and left[..., 2].mean() < 80
        assert right[..., 2].mean() > 180 and right[..., 0].mean() < 80


def test_float_frames_and_frame_counter(sink):
    before = sink.frames_encoded
    frame = np.zeros((48, 64, 3), np.float32)
    frame[..., 1] = 0.5
    deadline = time.time() + 10
    while sink.frames_encoded <= before and time.time() < deadline:
        sink.submit(frame)
        time.sleep(0.02)
    assert sink.frames_encoded > before


def _send_key(port, name, down):
    from urllib.parse import quote
    from urllib.request import urlopen

    urlopen(f"http://127.0.0.1:{port}/key?d={int(down)}&k={quote(name)}",
            timeout=5).close()


def test_key_events_roundtrip(sink):
    """Browser /key GETs land in poll_keys in arrival order (native path)."""
    assert sink.poll_keys() == []  # empty before any event
    _send_key(sink.port, "a", True)
    _send_key(sink.port, "ArrowLeft", True)
    _send_key(sink.port, "a", False)
    _send_key(sink.port, "+", True)  # urlencoded (%2B) name survives decode
    deadline = time.time() + 5
    got = []
    while len(got) < 4 and time.time() < deadline:
        got += sink.poll_keys()
        time.sleep(0.01)
    assert got == [("a", True), ("ArrowLeft", True), ("a", False), ("+", True)]
    assert sink.poll_keys() == []  # drained


def test_key_events_engine_drive(sink):
    """The full interaction loop: HTTP key events pan a running Engine's
    camera — the reference's windowed WASD interaction (keyboard.rs:3-45)
    over the headless stream."""
    from spacetime_tpu.engine import Engine
    from spacetime_tpu.ops.raytrace import RenderParams
    from spacetime_tpu.utils.config import EngineConfig, SceneSpec

    eng = Engine(EngineConfig(
        scene=SceneSpec(
            bodies=(("disc", 50, (0.45, 0.45), (0.1, 0.0), (0.2, 0.2, 1.0)),),
            capacity=256,
        ),
        render=RenderParams(num_rays=128),
        width=48, height=48, history=32, render_mode="points",
    ))
    cam_x0 = float(eng.camera.pos[0])
    # the 204 response is sent only after the event is queued server-side,
    # so once urlopen returns the engine loop is guaranteed to see it
    _send_key(sink.port, "d", True)  # pan right, held down
    eng.run(3, key_source=sink.poll_keys)
    assert float(eng.camera.pos[0]) > cam_x0


def test_python_fallback_key_events():
    from spacetime_tpu.utils.streamsink import _PyMjpegServer

    srv = _PyMjpegServer(port=0, quality=85)
    try:
        _send_key(srv.port, "z", True)
        _send_key(srv.port, "z", False)
        deadline = time.time() + 5
        got = []
        while len(got) < 2 and time.time() < deadline:
            got += srv.poll_keys()
            time.sleep(0.01)
        assert got == [("z", True), ("z", False)]
    finally:
        srv.close()


def test_key_token_gates_input_native():
    """With a key token set (auto on non-loopback binds), /key without the
    matching t= is rejected and queues nothing; with it, events flow."""
    s = StreamSink(port=0, width=16, height=16, key_token="sekrit")
    try:
        assert s.native
        from urllib.error import HTTPError
        from urllib.request import urlopen

        with pytest.raises(HTTPError) as ei:
            urlopen(f"http://127.0.0.1:{s.port}/key?d=1&k=q", timeout=5)
        assert ei.value.code == 403
        with pytest.raises(HTTPError):
            urlopen(f"http://127.0.0.1:{s.port}/key?d=1&k=q&t=wrong",
                    timeout=5)
        urlopen(f"http://127.0.0.1:{s.port}/key?d=1&k=a&t=sekrit",
                timeout=5).close()
        deadline = time.time() + 5
        got = []
        while not got and time.time() < deadline:
            got += s.poll_keys()
            time.sleep(0.01)
        assert got == [("a", True)]  # the rejected 'q' never queued
        # the index page echoes the token from its own URL on key fetches
        from urllib.request import urlopen as uo

        body = uo(f"http://127.0.0.1:{s.port}/", timeout=5).read()
        assert b"URLSearchParams" in body
    finally:
        s.close()


def test_key_token_gates_input_fallback():
    from urllib.error import HTTPError
    from urllib.request import urlopen

    from spacetime_tpu.utils.streamsink import _PyMjpegServer

    srv = _PyMjpegServer(port=0, quality=85, key_token="tk")
    try:
        with pytest.raises(HTTPError) as ei:
            urlopen(f"http://127.0.0.1:{srv.port}/key?d=1&k=q", timeout=5)
        assert ei.value.code == 403
        urlopen(f"http://127.0.0.1:{srv.port}/key?d=1&k=b&t=tk",
                timeout=5).close()
        deadline = time.time() + 5
        got = []
        while not got and time.time() < deadline:
            got += srv.poll_keys()
            time.sleep(0.01)
        assert got == [("b", True)]
    finally:
        srv.close()


def test_nonloopback_bind_autogenerates_token():
    """Binding beyond loopback without an explicit token must auto-generate
    one (ADVICE r4: /key can steer and kill the engine)."""
    s = StreamSink(port=0, width=16, height=16, bind="0.0.0.0")
    try:
        assert s.key_token  # non-empty secret
    finally:
        s.close()


def test_python_fallback_server():
    """The PIL/http.server fallback must work where the native lib can't."""
    from spacetime_tpu.utils.streamsink import _PyMjpegServer

    srv = _PyMjpegServer(port=0, quality=85)
    try:
        rgb = np.zeros((48, 64, 3), np.uint8)
        rgb[:] = (0, 255, 0)
        with socket.create_connection(("127.0.0.1", srv.port), timeout=5) as c:
            c.sendall(b"GET /stream HTTP/1.1\r\nHost: x\r\n\r\n")
            f = c.makefile("rb")
            status, headers = _read_headers(f)
            assert "multipart/x-mixed-replace" in headers["content-type"]
            srv.submit(rgb)
            srv.submit(rgb)
            _, data = _read_part(f)
            assert data[:2] == b"\xff\xd8"
    finally:
        srv.close()
