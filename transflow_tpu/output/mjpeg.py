"""Embedded MJPEG streaming server output.

Parity reference: transflow/output/mjpeg.py:26-157 — an aiohttp server on a
daemon thread serving multipart/x-mixed-replace of the latest JPEG-encoded
frame; doubles as the GUI preview channel.
"""
import asyncio
import logging
import threading

import cv2
import numpy as np

from .video_output import VideoOutput

logger = logging.getLogger(__name__)

JPEG_QUALITY = 50
BOUNDARY = "transflow-frame"


class MjpegOutput(VideoOutput):

    ROUTE = "/transflow"

    def __init__(self, width: int, height: int, framerate: float,
                 port: int = 8080, host: str | None = None):
        super().__init__(width, height, framerate)
        self.port = port
        self.host = host or "0.0.0.0"
        self._latest: bytes | None = None
        self._frame_event: asyncio.Event | None = None
        self._loop: asyncio.AbstractEventLoop | None = None
        self._thread: threading.Thread | None = None
        self._started = threading.Event()
        self._runner = None

    # -- server ----------------------------------------------------------

    async def _handler(self, request):
        from aiohttp import web
        response = web.StreamResponse(
            status=200,
            headers={"Content-Type":
                     f"multipart/x-mixed-replace;boundary={BOUNDARY}"})
        await response.prepare(request)
        try:
            while True:
                await self._frame_event.wait()
                self._frame_event.clear()
                data = self._latest
                if data is None:
                    continue
                header = (f"--{BOUNDARY}\r\nContent-Type: image/jpeg\r\n"
                          f"Content-Length: {len(data)}\r\n\r\n")
                await response.write(header.encode() + data + b"\r\n")
        except (ConnectionResetError, asyncio.CancelledError):
            pass
        return response

    async def _index(self, request):
        from aiohttp import web
        return web.Response(
            text=f"<html><body><img src='{self.ROUTE}'/></body></html>",
            content_type="text/html")

    def _serve(self):
        from aiohttp import web
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        self._frame_event = asyncio.Event()
        app = web.Application()
        app.router.add_get(self.ROUTE, self._handler)
        app.router.add_get("/", self._index)
        self._runner = web.AppRunner(app)
        self._loop.run_until_complete(self._runner.setup())
        site = web.TCPSite(self._runner, self.host, self.port)
        self._loop.run_until_complete(site.start())
        logger.info("MJPEG server on http://%s:%d%s", self.host, self.port,
                    self.ROUTE)
        self._started.set()
        self._loop.run_forever()

    # -- VideoOutput interface --------------------------------------------

    def open(self):
        self._thread = threading.Thread(target=self._serve, daemon=True,
                                        name="mjpeg-server")
        self._thread.start()
        if not self._started.wait(timeout=10):
            raise RuntimeError("MJPEG server failed to start")
        self.output_path = None  # network output: no file on disk
        return self

    def feed(self, frame):
        frame = np.asarray(frame, dtype=np.uint8)
        ok, encoded = cv2.imencode(
            ".jpg", cv2.cvtColor(frame, cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, JPEG_QUALITY])
        if not ok:
            return
        self._latest = encoded.tobytes()
        if self._loop is not None and self._frame_event is not None:
            self._loop.call_soon_threadsafe(self._frame_event.set)

    def close(self):
        if self._loop is not None:
            loop = self._loop

            def shutdown():
                async def cleanup():
                    if self._runner is not None:
                        await self._runner.cleanup()
                    loop.stop()
                loop.create_task(cleanup())

            loop.call_soon_threadsafe(shutdown)
            self._thread.join(timeout=5)
            if not loop.is_running():
                loop.close()
            self._loop = None
