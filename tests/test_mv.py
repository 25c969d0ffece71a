"""Motion-vector rasterization semantics, with mocked PyAV side data.

PyAV is absent in this image, so the decode path can't run; these tests
drive ``MotionVectorFlowSource._read_item`` directly with fake frames whose
``side_data`` mimics PyAV's, asserting the dense-field semantics of the
reference (transflow/flow/sources/av.py:61-77): block fill centred on
(src_x, src_y), negated displacement scaled by motion_scale, last-write-wins
on overlap, and the source==-1 assertion.
"""
import numpy as np
import pytest

from transflow_tpu.flow.sources.base import FlowItem
from transflow_tpu.flow.sources.mv import MotionVectorFlowSource


class FakeMV:
    def __init__(self, src_x, src_y, w, h, motion_x, motion_y,
                 motion_scale=4, source=-1):
        self.src_x = src_x
        self.src_y = src_y
        self.w = w
        self.h = h
        self.motion_x = motion_x
        self.motion_y = motion_y
        self.motion_scale = motion_scale
        self.source = source


class FakeFrame:
    def __init__(self, vectors):
        # PyAV exposes side_data as a mapping keyed by side-data type
        self.side_data = ({} if vectors is None
                          else {"MOTION_VECTORS": vectors})


def make_source(height=32, width=48, frames=()):
    src = MotionVectorFlowSource("fake.mp4")
    src.height = height
    src.width = width
    src.iterator = iter(frames)
    return src


def test_block_fill_sign_and_scale():
    # one 16x16 macroblock centred at (src_x=16, src_y=8), mv (+8, -4)/4
    src = make_source(frames=[FakeFrame([FakeMV(16, 8, 16, 16, 8, -4)])])
    item = src._read_item()
    assert item.kind == FlowItem.FLOW
    flow = item.array
    assert flow.shape == (32, 48, 2) and flow.dtype == np.float32
    # reference: flow[src_y-h/2 : src_y+h/2, src_x-w/2 : src_x+w/2] =
    #            (-motion_x/scale, -motion_y/scale)
    block = flow[0:16, 8:24]
    assert np.all(block[..., 0] == -2.0)   # -8/4
    assert np.all(block[..., 1] == 1.0)    # -(-4)/4
    # everything outside the block untouched
    outside = flow.copy()
    outside[0:16, 8:24] = 0
    assert np.count_nonzero(outside) == 0


def test_overlapping_blocks_last_write_wins():
    mvs = [FakeMV(8, 8, 16, 16, 4, 0, motion_scale=1),
           FakeMV(12, 8, 16, 16, 0, 8, motion_scale=1)]
    src = make_source(frames=[FakeFrame(mvs)])
    flow = src._read_item().array
    # overlap region [0:16, 4:16] takes the second MV's value
    assert np.all(flow[4, 10] == (0.0, -8.0))
    # non-overlapped part of the first block keeps its value
    assert np.all(flow[4, 2] == (-4.0, 0.0))


def test_no_side_data_yields_zero_flow():
    src = make_source(frames=[FakeFrame(None)])
    flow = src._read_item().array
    assert flow.shape == (32, 48, 2)
    assert np.count_nonzero(flow) == 0


def test_empty_vector_list_yields_zero_flow():
    src = make_source(frames=[FakeFrame([])])
    assert np.count_nonzero(src._read_item().array) == 0


def test_bidirectional_source_rejected():
    # reference asserts mv.source == -1 ("Encode with bf=0 and refs=1")
    src = make_source(frames=[FakeFrame([FakeMV(8, 8, 16, 16, 4, 4,
                                                source=1)])])
    with pytest.raises(AssertionError):
        src._read_item()


def test_missing_backends_raise_clear_error(monkeypatch):
    src = MotionVectorFlowSource("fake.mp4")
    try:
        import av  # noqa: F401
        pytest.skip("PyAV installed; gating path not reachable")
    except ImportError:
        pass
    import transflow_tpu.av_native
    monkeypatch.setattr(transflow_tpu.av_native, "is_available",
                        lambda: False)
    with pytest.raises(ImportError, match="PyAV or the native libav shim"):
        src._open_reader()


def test_native_backend_missing_file(tmp_path):
    # with the native shim available, a bad path is a FileNotFoundError
    # (not an ImportError) — same contract as the other sources
    pytest.importorskip("transflow_tpu.av_native")
    from transflow_tpu.av_native import is_available
    if not is_available():
        pytest.skip("native libav shim unavailable")
    src = MotionVectorFlowSource(str(tmp_path / "missing.mp4"))
    with pytest.raises(FileNotFoundError):
        src._open_reader()
