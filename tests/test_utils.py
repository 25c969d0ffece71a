import math
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from transflow_tpu.utils import (
    find_unique_path, load_bool_mask, load_float_mask, parse_color,
    parse_expression, parse_lock_intervals, parse_size, parse_timestamp)


class TestColors:

    def test_named(self):
        assert parse_color("red") == (255, 0, 0)
        assert parse_color("Black") == (0, 0, 0)
        assert parse_color("rebeccapurple") == (102, 51, 153)

    def test_hex(self):
        assert parse_color("#ff8000") == (255, 128, 0)
        assert parse_color("ff8000") == (255, 128, 0)
        assert parse_color("0xff8000") == (255, 128, 0)

    def test_rgb(self):
        assert parse_color("rgb(1, 2, 3)") == (1, 2, 3)
        assert parse_color("(1,2,3)") == (1, 2, 3)


class TestMasks:

    def test_default(self):
        m = load_float_mask(None, (4, 5), 1.0)
        assert m.shape == (4, 5)
        assert np.all(m == 1.0)

    def test_keywords(self):
        assert np.all(load_float_mask("zeros", (3, 3)) == 0)
        assert np.all(load_float_mask("ones", (3, 3)) == 1)
        r = load_float_mask("random", (8, 8))
        assert r.min() >= 0 and r.max() <= 1

    def test_border(self):
        m = load_float_mask("border-left:1", (2, 3))
        expected = np.array([[1, 0, 0], [1, 0, 0]], dtype=np.float32)
        assert np.array_equal(m, expected)
        m = load_float_mask("border:1", (4, 4))
        assert m[0, 0] == 1 and m[1, 1] == 0 and m[3, 3] == 1

    def test_border_percent(self):
        m = load_float_mask("border-top:50%", (4, 6))
        assert np.array_equal(m[:2], np.ones((2, 6))) and np.all(m[2:] == 0)

    def test_lines(self):
        m = load_float_mask("hline:2", (4, 4))
        assert np.all(m[1:3] == 1) and np.all(m[0] == 0) and np.all(m[3] == 0)
        m = load_float_mask("vline:2", (4, 4))
        assert np.all(m[:, 1:3] == 1) and np.all(m[:, 0] == 0)

    def test_circle(self):
        m = load_float_mask("circle:2", (8, 8))
        assert m[4, 4] == 1 and m[0, 0] == 0

    def test_rect(self):
        m = load_float_mask("rect:2:2", (6, 6))
        assert m[3, 3] == 1 and m[0, 0] == 0

    def test_grid(self):
        m = load_float_mask("grid:2:2:2", (16, 16))
        assert m[4, 4] == 1 and m[0, 0] == 0

    def test_inverse(self):
        m = load_float_mask("zeros:inv", (2, 2))
        assert np.all(m == 1)

    def test_image(self, tmp_path):
        import PIL.Image
        arr = np.zeros((4, 4, 3), dtype=np.uint8)
        arr[:2] = 255
        path = str(tmp_path / "mask.png")
        PIL.Image.fromarray(arr).save(path)
        m = load_float_mask(path)
        assert m.shape == (4, 4)
        assert np.all(m[:2] == 1) and np.all(m[2:] == 0)

    def test_bool(self):
        m = load_bool_mask("ones", (2, 2))
        assert m.dtype == bool and np.all(m)


class TestExpr:

    def test_scalar(self):
        fn = parse_expression("0.5 * t + 1")
        assert fn(2.0) == 2.0

    def test_math(self):
        fn = parse_expression("math.sin(t)")
        assert abs(float(fn(0.0))) < 1e-6

    def test_arrays(self):
        fn = parse_expression("r * np.cos(a)", ("t", "r", "a"))
        r = np.ones((2, 2), dtype=np.float32)
        a = np.zeros((2, 2), dtype=np.float32)
        out = np.asarray(fn(0.0, r, a))
        assert np.allclose(out, 1.0)

    def test_rejects_dunder(self):
        with pytest.raises(ValueError):
            parse_expression("().__class__")
        with pytest.raises(ValueError):
            parse_expression("__import__('os')")
        with pytest.raises(ValueError):
            parse_expression("open('/etc/passwd')")

    def test_lock_intervals(self):
        assert parse_lock_intervals("(1, 2)") == ((1.0, 2.0),)
        assert parse_lock_intervals("(1, 2), (3, 4)") == ((1.0, 2.0), (3.0, 4.0))


class TestMisc:

    def test_timestamp(self):
        assert parse_timestamp("00:00:01") == 1
        assert parse_timestamp("01:02:03.500") == 3723.5
        assert parse_timestamp(4.5) == 4.5
        assert parse_timestamp(None) is None

    def test_size(self):
        assert parse_size("1920x1080") == (1920, 1080)
        assert parse_size([640, 480]) == (640, 480)
        assert parse_size(None) is None

    def test_unique_path(self, tmp_path):
        path = str(tmp_path / "out.mp4")
        assert find_unique_path(path) == path
        with open(path, "w") as f:
            f.write("x")
        assert find_unique_path(path) == str(tmp_path / "out.000.mp4")

    def test_unique_path_flow(self, tmp_path):
        path = str(tmp_path / "video.flow.zip")
        with open(path, "w") as f:
            f.write("x")
        assert find_unique_path(path) == str(tmp_path / "video.000.flow.zip")


class TestControlSession:
    """Headless alteration editor over a checkpoint (extra/control.py)."""

    def test_session(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "extra"))
        import io
        import json
        import zipfile
        from control import ControlSession

        # synthetic checkpoint: mapping shifted by +1 column
        h, w = 6, 8
        pos_i = np.arange(h)[:, None] * np.ones((1, w), int)
        pos_j = np.clip(np.arange(w)[None, :] * np.ones((h, 1), int) + 1,
                        0, w - 1)
        path = str(tmp_path / "x_00001.ckpt.zip")
        buffer = io.BytesIO()
        np.savez(buffer, **{"layer0.pos_i": pos_i, "layer0.pos_j": pos_j})
        with zipfile.ZipFile(path, "w") as z:
            z.writestr("meta.json", json.dumps({"cursor": 1}))
            z.writestr("state.npz", buffer.getvalue())

        session = ControlSession(path)
        assert session.source_of(2, 3) == (2, 4)
        session.paint(2, 3, "red")
        assert tuple(session.alteration[2, 4]) == (255, 0, 0, 255)
        out = str(tmp_path / "alt.png")
        session.export(out)
        assert os.path.isfile(out)
        preview = session.preview()
        assert tuple(preview[2, 3]) == (255, 0, 0)
        session.erase(2, 3)
        assert session.alteration[2, 4, 3] == 0


class TestKernelAssets:
    def test_generated_kernels_match_reference_assets(self, tmp_path):
        """extra/make_kernels.py regenerates the reference's shipped
        --kernel asset set (assets/kernels) value-exactly: same names,
        same arrays, nothing extra."""
        import glob
        ref_root = "/root/reference/assets/kernels"
        if not os.path.isdir(ref_root):
            pytest.skip("reference assets not mounted")
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "extra"))
        try:
            from make_kernels import create_kernels
        finally:
            sys.path.pop(0)
        create_kernels(str(tmp_path))
        refs = sorted(glob.glob(os.path.join(ref_root, "*", "*.npy")))
        assert refs, "reference kernel assets missing"
        for ref in refs:
            rel = os.path.relpath(ref, ref_root)
            mine = tmp_path / rel
            assert mine.exists(), f"missing kernel {rel}"
            np.testing.assert_array_equal(np.load(ref), np.load(mine),
                                          err_msg=rel)
        generated = {os.path.relpath(p, tmp_path) for p in glob.glob(
            os.path.join(tmp_path, "*", "*.npy"))}
        assert generated == {os.path.relpath(p, ref_root) for p in refs}

    def test_identity_kernel_is_noop_through_device_conv(self, tmp_path):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "extra"))
        try:
            from make_kernels import create_kernels
        finally:
            sys.path.pop(0)
        create_kernels(str(tmp_path))
        from transflow_tpu.ops.image import conv2d_same
        kernel = np.load(tmp_path / "3x3" / "identity.npy")
        rng = np.random.default_rng(0)
        plane = rng.standard_normal((12, 17)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(conv2d_same(jnp.asarray(plane), kernel)), plane,
            atol=1e-6)


class TestExpressionPrecision:
    def test_scalar_math_is_double_precision(self):
        """Plain-scalar expressions must evaluate with f64 math like the
        reference's raw eval — the jnp-backed shim used to run trig in
        f32, drifting at large arguments (fuzz-caught: cos(3124.5) off by
        1e-4 relative)."""
        import math
        from transflow_tpu.utils.expr import parse_expression
        expr = "math.cos((((t * t) ** 2) / (pi + 6.0)))"
        got = float(parse_expression(expr, ["t"])(13.0))
        want = math.cos((13.0 * 13.0) ** 2 / (math.pi + 6.0))
        assert abs(got - want) < 1e-12

    def test_array_arguments_still_dispatch_to_jnp(self):
        import jax
        import jax.numpy as jnp
        from transflow_tpu.utils.expr import parse_expression
        fn = parse_expression("math.sin(r) * math.cos(a) + t",
                              ["t", "r", "a"])
        rr = jnp.linspace(0, 3, 12).reshape(3, 4)
        aa = jnp.linspace(-1, 1, 12).reshape(3, 4)
        out = jax.jit(fn)(jnp.float32(0.5), rr, aa)
        assert out.shape == (3, 4)
        assert bool(jnp.isfinite(out).all())
