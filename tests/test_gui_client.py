"""GUI client (static/app.js) config-assembly coverage without a JS
runtime (VERDICT r3 next-#7: the client had no automated tests at all).

Two layers of protection, both tied to the ACTUAL app.js source:

1. Schema-drift guard — every config key ``buildConfig()`` emits
   (extracted from the real file) must be a key ``Config.fromdict`` /
   ``PixmapSourceConfig`` / ``LayerConfig`` accepts, so an app.js edit
   that invents or typos a key fails CI instead of silently dropping a
   field server-side.
2. Protocol replay — the exact GENERATE JSON buildConfig assembles for a
   2-layer / 2-pixmap setup (hand-derived, shape-asserted against the
   extracted key set) parses through ``Config.fromdict`` into the
   expected object, covering the client->server contract the reference's
   master.js exercises (reference gui/master.js:5-88).

Parity: /root/reference/transflow/gui/master.js builds the same JSON
blob; the reference has no client tests either — this is the rebuild's
addition per SURVEY §4's test plan.
"""
import json
import os
import re

from transflow_tpu.config import Config, LayerConfig, PixmapSourceConfig

APP_JS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "transflow_tpu", "gui", "static", "app.js")


def _build_config_source():
    text = open(APP_JS, encoding="utf8").read()
    match = re.search(r"function buildConfig\(\).*?\n}\n", text, re.S)
    assert match, "buildConfig() not found in app.js"
    return match.group(0), text


def _extract_keys(block, prefix_re):
    """Keys of an object literal: lines like `key: expr,` inside block."""
    return set(re.findall(prefix_re, block))


def test_buildconfig_keys_match_config_schema():
    src, _ = _build_config_source()
    # top-level config object literal
    top = re.search(r"const config = \{(.*?)\n  \};", src, re.S).group(1)
    # strip the nested pixmap/layer mappers so their keys don't bleed in
    top_flat = re.sub(r"\(\{.*?\}\)", "", top, flags=re.S)
    top_keys = _extract_keys(top_flat, r"\n    (\w+):")
    # keys appended conditionally after the literal (seed, batch, ...)
    top_keys |= set(re.findall(r"config\.(\w+) =", src))
    config_keys = {key for key, _ in Config._FIELDS}
    unknown = top_keys - config_keys
    assert not unknown, f"app.js emits unknown Config keys: {unknown}"

    pix = re.search(r"pixmap_sources: pixmaps\.map\(\(p\) => \(\{(.*?)\}\)\)",
                    src, re.S).group(1)
    pix_keys = _extract_keys(pix, r"\n      (\w+):")
    pix_schema = {key for key, _ in PixmapSourceConfig._FIELDS}
    assert pix_keys <= pix_schema, pix_keys - pix_schema

    lay = re.search(r"layers: layers\.slice\(0, MAX_LAYERS\)"
                    r"\.map\(\(l\) => \(\{(.*?)\}\)\)", src, re.S).group(1)
    lay_keys = _extract_keys(lay, r"\n      (\w+):")
    lay_schema = {key for key, _ in LayerConfig._FIELDS}
    assert lay_keys <= lay_schema, lay_keys - lay_schema


def test_grid_limits_match_reference_client():
    _, text = _build_config_source()
    assert re.search(r"MAX_LAYERS = 5", text)
    assert re.search(r"MAX_PIXMAPS = 5", text)  # master.js:80-88


def test_generate_json_round_trips_two_layers_two_pixmaps():
    """The GENERATE payload for a 2-layer/2-pixmap editor state, assembled
    exactly as buildConfig does (same key set, same value coercions:
    parseInt/parseFloat/checkbox booleans/trim-to-null), must parse into
    the expected Config."""
    payload = {
        "flow_path": "flow.mp4",
        "direction": "backward",
        "use_mvs": False,
        "cv_config": {"method": "horn-schunck"},
        "seek_time": "00:00:02",
        "duration_time": None,
        "repeat": 2,
        "flow_filters": "clip=8",
        "mask_path": None,
        "kernel_path": "assets/kernels/3x3/blur-gaussian.npy",
        "lock_mode": "stay",
        "lock_expr": "(0.5, 0.2)",
        "vcodec": "h264",
        "render_scale": 1.0,
        "render_colors": None,
        "render_binary": False,
        "compositor_background": "#102030",
        "output_path": "out.mp4",
        "view_flow": False,
        "view_flow_magnitude": False,
        "pixmap_sources": [
            {"path": "a.png", "layers": [0], "introduction_path": None,
             "alteration_path": None, "seek_time": None, "repeat": 1},
            {"path": "b.mp4", "layers": [0, 1], "introduction_path": None,
             "alteration_path": "alt.png",
             "seek_time": "00:00:01.500", "repeat": 3},
        ],
        "layers": [
            {"index": 0, "classname": "moveref",
             "mask_src": None, "mask_dst": "border-left:10%",
             "mask_alpha": None,
             "transparent_pixels_can_move": False,
             "pixels_can_move_to_empty_spot": True,
             "pixels_can_move_to_filled_spot": False,
             "moving_pixels_leave_empty_spot": False,
             "reset_mode": "random", "reset_mask": None,
             "reset_random_factor": 0.1, "reset_constant_step": 1.0,
             "reset_linear_factor": 0.1, "reset_source": True,
             "introduce_pixels_on_empty_spots": True,
             "introduce_pixels_on_filled_spots": True,
             "introduce_moving_pixels": True,
             "introduce_unmoving_pixels": True,
             "introduce_once": False,
             "introduce_on_all_filled_spots": False,
             "introduce_on_all_empty_spots": False},
            {"index": 1, "classname": "introduction",
             "mask_src": None, "mask_dst": None, "mask_alpha": None,
             "transparent_pixels_can_move": False,
             "pixels_can_move_to_empty_spot": True,
             "pixels_can_move_to_filled_spot": True,
             "moving_pixels_leave_empty_spot": True,
             "reset_mode": "off", "reset_mask": None,
             "reset_random_factor": 0.5, "reset_constant_step": 0.5,
             "reset_linear_factor": 0.5, "reset_source": False,
             "introduce_pixels_on_empty_spots": True,
             "introduce_pixels_on_filled_spots": False,
             "introduce_moving_pixels": True,
             "introduce_unmoving_pixels": False,
             "introduce_once": True,
             "introduce_on_all_filled_spots": False,
             "introduce_on_all_empty_spots": False},
        ],
        "seed": 7,
        "batch_frames": 4,
    }
    # shape-assert the payload's key set against the real app.js so this
    # hand-derived blob can't drift from what the client actually sends
    src, _ = _build_config_source()
    for key in payload:
        assert re.search(rf"\b{key}\b", src), f"{key} not in buildConfig"

    cfg = Config.fromdict(json.loads(json.dumps(payload)))
    assert cfg.flow_path == "flow.mp4"
    assert cfg.seek_time == 2.0  # "00:00:02" through parse_timestamp
    assert cfg.repeat == 2 and cfg.seed == 7 and cfg.batch_frames == 4
    assert [p.path for p in cfg.pixmap_sources] == ["a.png", "b.mp4"]
    assert cfg.pixmap_sources[1].layers == [0, 1]
    assert cfg.pixmap_sources[1].seek_time == 1.5
    assert len(cfg.layers) == 2
    assert cfg.layers[0].classname == "moveref"
    assert str(cfg.layers[0].reset_mode).lower().endswith("random")
    assert cfg.layers[1].classname == "introduction"
    assert cfg.layers[1].introduce_once is True
    assert cfg.layers[1].moving_pixels_leave_empty_spot is True
    assert cfg.layers[0].pixels_can_move_to_filled_spot is False
    assert cfg.layers[0].reset_source is True
    assert cfg.layers[1].introduce_pixels_on_filled_spots is False
    assert cfg.cv_config == {"method": "horn-schunck"}
    assert cfg.kernel_path.endswith("blur-gaussian.npy")
    assert cfg.pixmap_sources[1].alteration_path == "alt.png"
    # round trip: what the server would re-serialize matches
    again = Config.fromdict(cfg.todict())
    assert [l.index for l in again.layers] == [0, 1]
    assert again.cv_config == {"method": "horn-schunck"}


def test_inline_cv_config_drives_a_render(tmp_path):
    """cv_config as an inline dict (what the client's method select sends)
    routes through CvFlowConfig end-to-end."""
    import cv2
    import numpy as np
    from transflow_tpu.pipeline import Pipeline
    video = str(tmp_path / "v.avi")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    for t in range(5):
        writer.write(np.roll(base, shift=2 * t, axis=1))
    writer.release()
    out = str(tmp_path / "o.avi")
    cfg = Config(video, cv_config={"method": "horn-schunck",
                                   "hs_iterations": 2},
                 pixmap_sources=[PixmapSourceConfig("noise", layers=[0])],
                 output_path=out, vcodec="mjpeg", seed=3)
    Pipeline(cfg, progress=False, execute=False).run()
    assert os.path.exists(out)
    # a bad inline config is refused
    import pytest
    cfg = Config(video, cv_config={"method": "nope"},
                 pixmap_sources=[PixmapSourceConfig("noise", layers=[0])],
                 output_path=out, vcodec="mjpeg", seed=3)
    with pytest.raises(Exception):
        Pipeline(cfg, progress=False, execute=False).run()
    # ...and a dangling path no longer silently falls back to defaults
    cfg = Config(video, cv_config="/no/such/file.json",
                 pixmap_sources=[PixmapSourceConfig("noise", layers=[0])],
                 output_path=out, vcodec="mjpeg", seed=3)
    with pytest.raises(Exception):
        Pipeline(cfg, progress=False, execute=False).run()
