"""GUI server integration: HTTP ping, websocket protocol, full GENERATE."""
import asyncio
import json
import socket
import time
import urllib.request

import cv2
import numpy as np
import pytest

from transflow_tpu.gui.server import GuiServer


def _free_port():
    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        return probe.getsockname()[1]


@pytest.fixture(scope="module")
def server():
    gui = GuiServer("127.0.0.1", _free_port(), _free_port())
    gui.start(block=False, open_browser=False)
    yield gui
    gui.stop()


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gui") / "video.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                             (48, 32))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    for t in range(8):
        writer.write(np.roll(base, t, axis=1))
    writer.release()
    return path


def test_ping(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/ping", timeout=5) as resp:
        assert resp.read() == b"PONG"


def test_index_and_wss(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/", timeout=5) as resp:
        body = resp.read().decode()
        assert "transflow" in body
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/wss", timeout=5) as resp:
        assert int(resp.read()) == server.ws_port


def test_media_range(server, test_video):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/media?path={test_video}",
        headers={"Range": "bytes=0-99"})
    with urllib.request.urlopen(req, timeout=5) as resp:
        assert resp.status == 206
        assert len(resp.read()) == 100


def test_generate_job(server, test_video, tmp_path):
    import websockets.sync.client

    out = str(tmp_path / "gui-out.avi")
    config = {
        "flow_path": test_video,
        "output_path": out,
        "vcodec": "mjpeg",
        "pixmap_sources": [{"path": "noise", "layers": [0]}],
        "seed": 1,
    }
    with websockets.sync.client.connect(
            f"ws://127.0.0.1:{server.ws_port}") as ws:
        ws.send("GENERATE " + json.dumps(config))
        saw_preview = saw_status = done = False
        deadline = time.time() + 120
        while time.time() < deadline:
            message = ws.recv(timeout=60)
            if message.startswith("PREVIEW"):
                saw_preview = True
            elif message.startswith("STATUS"):
                saw_status = True
                status = json.loads(message[7:])
                assert status.get("error") in (None, "")
            elif message.startswith("DONE"):
                done = True
                break
            elif message.startswith("ERROR"):
                raise AssertionError(message)
        assert saw_preview and done
        # 8 frames -> 7 flows
        cap = cv2.VideoCapture(out)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 7
        cap.release()


def test_interrupt_without_job(server):
    import websockets.sync.client
    with websockets.sync.client.connect(
            f"ws://127.0.0.1:{server.ws_port}") as ws:
        ws.send("INTERRUPT")  # no job: must not crash the server
        ws.send("RELOAD")
        # INTERRUPT may broadcast CANCEL to every client (including this
        # one) when an earlier test's job left a cancel_event behind —
        # skim broadcasts until the directed RELOAD answer arrives
        message = ws.recv(timeout=10)
        while not message.startswith("RELOAD "):
            message = ws.recv(timeout=10)
        state = json.loads(message[len("RELOAD "):])
        assert set(state) == {"ongoing", "outputFile", "previewUrl"}
        assert state["previewUrl"].endswith("/transflow")


def test_reload_reports_finished_job_state(server, test_video, tmp_path):
    """After a completed GENERATE, a reloading client's RELOAD resync must
    report ongoing=False and the produced output file (reference
    gui/server.py:222-227: RELOAD echoes job state so a page reload
    doesn't lose the session)."""
    import websockets.sync.client

    out = str(tmp_path / "reload-out.avi")
    config = {
        "flow_path": test_video,
        "output_path": out,
        "vcodec": "mjpeg",
        "pixmap_sources": [{"path": "noise", "layers": [0]}],
        "seed": 3,
    }
    with websockets.sync.client.connect(
            f"ws://127.0.0.1:{server.ws_port}") as ws:
        ws.send("GENERATE " + json.dumps(config))
        deadline = time.time() + 120
        while time.time() < deadline:
            message = ws.recv(timeout=60)
            if message.startswith("DONE"):
                break
            if message.startswith("ERROR"):
                raise AssertionError(message)
    # a fresh connection (simulating the reloaded page) resyncs state
    with websockets.sync.client.connect(
            f"ws://127.0.0.1:{server.ws_port}") as ws:
        ws.send("RELOAD")
        message = ws.recv(timeout=10)
        assert message.startswith("RELOAD ")
        state = json.loads(message[len("RELOAD "):])
        assert state["ongoing"] is False
        assert state["outputFile"] == out


def test_generate_layered_multi_pixmap(server, test_video, tmp_path):
    """GENERATE with a 2-layer / 2-pixmap config through a real websocket
    round trip (reference tests/test_gui.py:33-105 drives the same
    scope): layered introduction + moveref, one still + one video
    pixmap, an output file, and a clean DONE."""
    import websockets.sync.client

    out = str(tmp_path / "layered-out.avi")
    config = {
        "flow_path": test_video,
        "output_path": out,
        "vcodec": "mjpeg",
        "pixmap_sources": [
            {"path": "cnoise", "layers": [0]},
            {"path": test_video, "layers": [1]},
        ],
        "layers": [
            {"index": 0, "classname": "moveref", "reset_mode": "random",
             "reset_random_factor": 0.1},
            {"index": 1, "classname": "introduction",
             "mask_alpha": "circle:10"},
        ],
        "seed": 5,
    }
    with websockets.sync.client.connect(
            f"ws://127.0.0.1:{server.ws_port}") as ws:
        ws.send("GENERATE " + json.dumps(config))
        saw_preview = saw_status = done = False
        deadline = time.time() + 180
        while time.time() < deadline:
            message = ws.recv(timeout=120)
            if message.startswith("PREVIEW"):
                saw_preview = True
            elif message.startswith("STATUS"):
                saw_status = True
                status = json.loads(message[7:])
                assert status.get("error") in (None, "")
            elif message.startswith("DONE"):
                done = True
                assert out in message
                break
            elif message.startswith("ERROR"):
                raise AssertionError(message)
        assert saw_preview and saw_status and done
        cap = cv2.VideoCapture(out)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 7
        cap.release()


def test_file_dialog_round_trip_or_headless_error(server):
    """FILE_OPEN must answer: 'FILE <key> <path>' with a display, or a clear
    ERROR when headless (the reference's tkinter dialogs need one too)."""
    import websockets.sync.client
    with websockets.sync.client.connect(
            f"ws://127.0.0.1:{server.ws_port}") as ws:
        ws.send("FILE_OPEN flow_path")
        message = ws.recv(timeout=15)
        assert (message.startswith("FILE flow_path ")
                or message.startswith("ERROR file dialog unavailable"))


def test_media_full_and_suffix_range(server, test_video):
    import os
    size = os.path.getsize(test_video)
    # no Range header: full body, 200
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/media?path={test_video}",
            timeout=5) as resp:
        assert resp.status == 200
        assert len(resp.read()) == size
    # open-ended range: from offset to EOF
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/media?path={test_video}",
        headers={"Range": f"bytes={size - 50}-"})
    with urllib.request.urlopen(req, timeout=5) as resp:
        assert resp.status == 206
        assert resp.headers["Content-Range"] == \
            f"bytes {size - 50}-{size - 1}/{size}"
        assert len(resp.read()) == 50


def test_media_missing_file(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/media?path=/nope/missing.mp4")
    try:
        urllib.request.urlopen(req, timeout=5)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as err:
        assert err.code == 404


def test_client_grid_limits_declared():
    """The client enforces the reference's 5x5 layer/source grid
    (master.js:80-88)."""
    import os
    static = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "transflow_tpu", "gui", "static")
    app = open(os.path.join(static, "app.js"), encoding="utf8").read()
    assert "MAX_LAYERS = 5" in app
    assert "MAX_PIXMAPS = 5" in app
    for feature in ["FILE_OPEN", "FILE_SAVE", "applyFile", "/media?path=",
                    "media_video", "requestFile"]:
        assert feature in app, feature
    index = open(os.path.join(static, "index.html"), encoding="utf8").read()
    for element in ["browse_flow", "browse_output", "media_video",
                    "media_image"]:
        assert element in index, element

    for element in ["reload", "export_json", "import_json"]:
        assert f'id="{element}"' in index, element
    for feature in ["applyConfig", "Export JSON"]:
        assert feature in app or feature in index, feature
