"""Engine internals: live estimator re-jit, flow ingestion, state arrays."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transflow_tpu.engine import SourceRuntime, make_estimator_step
from transflow_tpu.flow import Direction
from transflow_tpu.flow.sources.base import FlowItem
from transflow_tpu.flow.sources.cv import CvFlowConfig


class StubSource:
    def __init__(self, config):
        self.config = config
        self.direction = Direction.BACKWARD
        self.height, self.width = 24, 32


def make_runtime():
    config = CvFlowConfig()
    source = StubSource(config)
    step = make_estimator_step("farneback", config.estimator_kwargs(),
                               source.direction)
    return SourceRuntime(source, step), config


def test_rejit_only_on_version_bump():
    """The tuning window bumps config.version; the runtime must rebuild the
    jitted estimator then — and only then (re-jits are expensive)."""
    runtime, config = make_runtime()
    original = runtime.estimator_step
    runtime._maybe_rejit()
    assert runtime.estimator_step is original
    config.update("fb_levels", 2)  # bumps version
    runtime._maybe_rejit()
    assert runtime.estimator_step is not original
    rebuilt = runtime.estimator_step
    runtime._maybe_rejit()
    assert runtime.estimator_step is rebuilt


def test_rejit_changes_estimation():
    """The rebuilt step must actually use the new hyper-parameters."""
    runtime, config = make_runtime()
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    b = np.roll(a, 2, axis=1)
    runtime.reset(a)
    flow1 = np.asarray(runtime.ingest(FlowItem(FlowItem.FRAME, b)))
    config.update("fb_winsize", 5)
    config.update("fb_levels", 1)
    runtime2, _ = make_runtime()
    runtime2.source.config = config
    runtime2._cfg_version = -1  # force rejit against the edited config
    runtime2._maybe_rejit()
    runtime2.reset(a)
    flow2 = np.asarray(runtime2.ingest(FlowItem(FlowItem.FRAME, b)))
    assert flow1.shape == flow2.shape == (24, 32, 2)
    assert not np.allclose(flow1, flow2)


def test_replay_before_first_flow_raises():
    runtime, _ = make_runtime()
    with pytest.raises(RuntimeError, match="Lock replay"):
        runtime.ingest(FlowItem(FlowItem.REPLAY, locked=True))


def test_replay_returns_last_flow_and_advances_discarded():
    runtime, _ = make_runtime()
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    b = np.roll(a, 1, axis=1)
    c = np.roll(a, 2, axis=1)
    runtime.reset(a)
    flow_b = runtime.ingest(FlowItem(FlowItem.FRAME, b))
    # lock skip: the discarded frame advances prev_gray, output replays
    replay = runtime.ingest(FlowItem(
        FlowItem.REPLAY, locked=True,
        discarded=FlowItem(FlowItem.FRAME, c)))
    np.testing.assert_array_equal(np.asarray(replay), np.asarray(flow_b))
    np.testing.assert_array_equal(np.asarray(runtime.prev_gray), c)
