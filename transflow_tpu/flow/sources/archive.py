"""Replay of a precomputed .flow.zip archive.

Parity reference: transflow/flow/sources/archive.py:10-51 — meta.json
(direction, width, height, framerate) + one %09d.npy per frame.
"""
import json
import zipfile

import numpy as np

from .. import Direction
from .base import FlowItem, FlowSource


class ArchiveFlowSource(FlowSource):

    yields_frames = False

    def __init__(self, path: str, **kwargs):
        super().__init__(**kwargs)
        self.path = path
        self.archive: zipfile.ZipFile | None = None

    def _open_reader(self):
        self.archive = zipfile.ZipFile(self.path)
        with self.archive.open("meta.json") as file:
            meta = json.loads(file.read().decode())
        # archives carry their own direction (older ones were forward-only)
        self.direction = Direction(
            meta.get("direction", Direction.FORWARD.value))
        self.width = meta["width"]
        self.height = meta["height"]
        self.framerate = meta["framerate"]
        self.base_length = len(
            [n for n in self.archive.namelist() if n.endswith(".npy")])

    def _rewind_reader(self, frame_index: int):
        pass  # random access by name

    def _read_item(self) -> FlowItem:
        name = f"{self.input_frame_index:09d}.npy"
        try:
            with self.archive.open(name) as file:
                flow = np.load(file)
        except KeyError:
            raise StopIteration from None
        return FlowItem(FlowItem.FLOW, flow.astype(np.float32))

    def _close_reader(self):
        if self.archive is not None:
            self.archive.close()
