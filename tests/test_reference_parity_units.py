"""Unit-level parity against the actual reference implementation.

Complements test_reference_parity.py's end-to-end checks with exact
component comparisons executed against the mounted ychalier/transflow
package: mask DSL, CSS colors, flow renderers, merge functions, filters,
and the flow-source seek/duration/repeat/lock length arithmetic.
Skipped automatically when the reference mount is absent.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "transflow")),
    reason="reference package not mounted")


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REFERENCE_ROOT)
    import transflow.utils  # noqa: F401
    yield
    sys.path.remove(REFERENCE_ROOT)


MASK_RULES = [
    "zeros", "ones", "border:4", "border:10%", "border:2:4:6:8",
    "border-top:5", "border-right:25%", "border-bottom:3", "border-left:8",
    "hline:6", "vline:10", "circle:12", "circle:30%", "rect:20:10",
    "grid:3:4:5", "ones:inv", "border:4:inv", "circle:25%:inv",
]


class TestMaskDSL:

    @pytest.mark.parametrize("rule", MASK_RULES)
    def test_float_mask(self, ref, rule):
        import transflow.utils as ru
        from transflow_tpu.utils import load_float_mask
        theirs = ru.load_float_mask(rule, (48, 64))
        ours = load_float_mask(rule, (48, 64))
        np.testing.assert_array_equal(np.asarray(ours, np.float64),
                                      np.asarray(theirs, np.float64),
                                      err_msg=rule)

    @pytest.mark.parametrize("rule", MASK_RULES)
    def test_bool_mask(self, ref, rule):
        import transflow.utils as ru
        from transflow_tpu.utils import load_bool_mask
        theirs = ru.load_bool_mask(rule, (48, 64))
        ours = load_bool_mask(rule, (48, 64))
        np.testing.assert_array_equal(np.asarray(ours, bool),
                                      np.asarray(theirs, bool), err_msg=rule)

    def test_image_mask(self, ref, tmp_path):
        import PIL.Image
        import transflow.utils as ru
        from transflow_tpu.utils import load_float_mask
        rng = np.random.default_rng(0)
        path = str(tmp_path / "m.png")
        PIL.Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(path)
        np.testing.assert_allclose(
            np.asarray(load_float_mask(path, (48, 64)), np.float64),
            np.asarray(ru.load_float_mask(path, (48, 64)), np.float64),
            atol=1e-6)


class TestColors:

    def test_all_named_colors(self, ref):
        import transflow.utils as ru
        from transflow_tpu.utils import parse_color
        for name in ru.NAMED_COLORS:
            assert tuple(parse_color(name)) == tuple(ru.parse_color(name)), \
                name

    @pytest.mark.parametrize("value", [
        "#fff", "#A0B1C2", "rgb(1, 2, 3)", "0a0b0c", "teal"])
    def test_formats(self, ref, value):
        import transflow.utils as ru
        from transflow_tpu.utils import parse_color
        assert tuple(parse_color(value)) == tuple(ru.parse_color(value))


class TestRenderers:

    def test_render1d(self, ref):
        import transflow.output.render as rr
        from transflow_tpu.ops.render import render1d
        rng = np.random.default_rng(1)
        mag = (5 * rng.random((32, 40))).astype(np.float32)
        for scale, binary in [(0.1, False), (0.5, False), (0.3, True)]:
            theirs = rr.render1d(mag, scale, None, binary)
            ours = np.asarray(render1d(jnp.asarray(mag), scale, None,
                                       binary))
            np.testing.assert_array_equal(ours, theirs,
                                          err_msg=f"{scale} {binary}")

    def test_render1d_custom_colors(self, ref):
        import transflow.output.render as rr
        from transflow_tpu.ops.render import render1d
        rng = np.random.default_rng(2)
        mag = (3 * rng.random((16, 20))).astype(np.float32)
        colors = ("#102030", "#c0ffee")
        np.testing.assert_array_equal(
            np.asarray(render1d(jnp.asarray(mag), 0.4, colors)),
            rr.render1d(mag, 0.4, colors))

    def test_render2d(self, ref):
        import transflow.output.render as rr
        from transflow_tpu.ops.render import render2d
        rng = np.random.default_rng(3)
        flow = (6 * rng.standard_normal((32, 40, 2))).astype(np.float32)
        for scale in (0.05, 0.2):
            theirs = rr.render2d(flow, scale)
            ours = np.asarray(render2d(jnp.asarray(flow), scale))
            diff = np.abs(ours.astype(int) - theirs.astype(int))
            assert diff.max() <= 1, f"scale {scale}: max diff {diff.max()}"


class TestMerges:

    @pytest.mark.parametrize("name", ["first", "sum", "average",
                                      "difference", "product", "maskbin",
                                      "masklin", "absmax"])
    def test_merge(self, ref, name):
        import transflow.pipeline as rp
        from transflow_tpu.flow.merge import get_merge_function
        rng = np.random.default_rng(4)
        flows = [rng.standard_normal((24, 30, 2)).astype(np.float32)
                 for _ in range(2)]
        # reference merges mutate their inputs (binarize_arrays) — copy
        theirs = rp.Pipeline.FLOW_MERGING_FUNCTIONS[name](
            [f.copy() for f in flows])
        ours = np.asarray(get_merge_function(name)(
            [jnp.asarray(f) for f in flows]))
        np.testing.assert_allclose(ours, np.asarray(theirs, np.float32),
                                   atol=1e-6, err_msg=name)


class TestFilters:

    def _run_ref(self, ref, name, args, flow, t):
        import transflow.flow.filters as rf
        filt = rf.FlowFilter.from_args(name, args)
        out = flow.copy()
        filt.apply(out, t)
        return out

    def _run_ours(self, spec, flow, t):
        from transflow_tpu.flow.filters import FlowFilter
        filters = FlowFilter.parse_many(spec)
        out = jnp.asarray(flow)
        for f in filters:
            out = f(out, jnp.float32(t))
        return np.asarray(out)

    @pytest.fixture()
    def flow(self):
        rng = np.random.default_rng(5)
        return (4 * rng.standard_normal((24, 30, 2))).astype(np.float32)

    def test_scale(self, ref, flow):
        for t in (0.0, 1.25):
            np.testing.assert_allclose(
                self._run_ours("scale=1+t", flow, t),
                self._run_ref(ref, "scale", ("1+t",), flow, t), atol=1e-5)

    def test_threshold(self, ref, flow):
        np.testing.assert_allclose(
            self._run_ours("threshold=2.5", flow, 0.0),
            self._run_ref(ref, "threshold", ("2.5",), flow, 0.0), atol=1e-6)

    def test_clip(self, ref, flow):
        np.testing.assert_allclose(
            self._run_ours("clip=1.5", flow, 0.0),
            self._run_ref(ref, "clip", ("1.5",), flow, 0.0), atol=1e-5)

    def test_polar(self, ref, flow):
        np.testing.assert_allclose(
            self._run_ours("polar=r*2:a+1", flow, 0.0),
            self._run_ref(ref, "polar", ("r*2", "a+1"), flow, 0.0),
            atol=1e-4)


class TestLengthArithmetic:
    """Seek/duration/repeat/lock bookkeeping vs the reference Builder on the
    same video (pure host math; must agree exactly).

    Tested on a CvFlowSource: the reference's ArchiveFlowSource.Builder
    overrides build() WITHOUT calling super().build()
    (/root/reference/transflow/flow/sources/archive.py:23-31 vs
    cv.py:429/av.py:38), so seek/duration/repeat/lock are silently ignored
    for .flow.zip inputs there — a latent reference bug this implementation
    intentionally does not replicate (our base open() always runs the
    bookkeeping; see flow/sources/base.py)."""

    @pytest.fixture(scope="class")
    def video(self, tmp_path_factory):
        import cv2
        path = str(tmp_path_factory.mktemp("len") / "clip.avi")
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                                 10.0, (32, 24))
        rng = np.random.default_rng(6)
        base = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        for t in range(30):
            writer.write(np.roll(base, t, axis=1))
        writer.release()
        return path

    CASES = [
        dict(),
        dict(seek_time=0.5),
        dict(duration_time=1.2),
        dict(seek_time=0.5, duration_time=1.0),
        dict(repeat=3),
        dict(seek_time=1.0, repeat=2),
        dict(lock_expr="(0.5, 0.7)", lock_mode="stay"),
        dict(seek_time=0.3, duration_time=2.0, repeat=2,
             lock_expr="(0.2, 0.4), (1.1, 0.3)", lock_mode="stay"),
        dict(lock_expr="0.5 <= t < 1.0", lock_mode="skip"),
    ]

    @pytest.mark.parametrize("case", CASES)
    def test_case(self, ref, video, case):
        from transflow.flow.sources.source import FlowSource as RefSource
        from transflow_tpu.flow.sources.base import FlowSource
        builder = RefSource.from_args(video, **case)
        with builder as theirs:
            with FlowSource.from_args(video, **case) as ours:
                assert ours.start_frame == builder.start_frame, case
                assert ours.end_frame == builder.end_frame, case
                assert ours.length == builder.length, case
                # drive both to exhaustion: emitted tick counts must agree
                # (our source yields FRAME items pre-estimation; the
                # reference computes flow per tick — counts are the contract)
                ours_count = len(list(ours))
                try:
                    theirs_count = len(list(theirs))
                except IndexError:
                    # latent reference bug: the lock-stay interval index
                    # runs past the list once the last interval ends
                    # mid-video (source.py:306); our implementation guards
                    # that (base.py:198-199) and keeps producing the
                    # builder-computed length
                    assert case.get("lock_mode") == "stay", case
                    assert ours_count == ours.length, case
                    return
                assert ours_count == theirs_count, case

    def test_archive_bookkeeping_runs_here(self, tmp_path):
        """Our archive source honors seek/duration/repeat (the reference's
        doesn't — see class docstring)."""
        import io
        import json
        import zipfile
        from transflow_tpu.flow.sources.base import FlowSource
        path = str(tmp_path / "clip.flow.zip")
        with zipfile.ZipFile(path, "w") as z:
            z.writestr("meta.json", json.dumps(
                {"direction": 1, "width": 16, "height": 12,
                 "framerate": 10.0}))
            for index in range(20):
                buffer = io.BytesIO()
                np.save(buffer, np.zeros((12, 16, 2), np.float32))
                z.writestr(f"{index:09d}.npy", buffer.getvalue())
        with FlowSource.from_args(path, seek_time=0.5, duration_time=1.0,
                                  repeat=2) as source:
            assert source.start_frame == 5
            assert source.end_frame == 15
            assert source.length == 20
            assert len(list(source)) == 20
