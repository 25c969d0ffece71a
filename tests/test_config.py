from transflow_tpu.config import Config, LayerConfig, PixmapSourceConfig
from transflow_tpu.flow import Direction, LockMode


def test_defaults():
    cfg = Config("video.mp4")
    assert cfg.direction == Direction.FORWARD
    assert cfg.lock_mode == LockMode.STAY
    assert cfg.seek_time == 0
    assert cfg.flows_merging_function == "first"
    assert isinstance(cfg.seed, int)


def test_auto_layers():
    cfg = Config("video.mp4", pixmap_sources=[
        PixmapSourceConfig("image.png", layers=[0, 2])])
    indices = {layer.index for layer in cfg.layers}
    assert indices == {0, 2}


def test_merge_forced_first():
    cfg = Config("video.mp4", flows_merging_function="sum")
    assert cfg.flows_merging_function == "first"
    cfg = Config("video.mp4", extra_flow_paths=["extra.mp4"],
                 flows_merging_function="sum")
    assert cfg.flows_merging_function == "sum"


def test_to_time():
    cfg = Config("video.mp4", seek_time="00:00:02", to_time="00:00:05")
    assert cfg.duration_time == 3


def test_roundtrip():
    cfg = Config(
        "video.mp4",
        extra_flow_paths=["other.mp4"],
        flows_merging_function="absmax",
        use_mvs=False,
        mask_path="circle:10",
        flow_filters="scale=2",
        direction="backward",
        seek_time=1.0,
        duration_time=2.0,
        repeat=2,
        lock_expr="(1, 2)",
        lock_mode="stay",
        pixmap_sources=[PixmapSourceConfig(
            "img.png", seek_time=0.5, alteration_path="a.png",
            introduction_path="ones", repeat=2, layers=[1])],
        layers=[LayerConfig(1, classname="introduction",
                            reset_mode="random", reset_random_factor=0.5,
                            moving_pixels_leave_empty_spot=True)],
        compositor_background="#123456",
        output_path=["out.mp4", "mjpeg:8080"],
        vcodec="h265",
        size="640x480",
        view_flow=False,
        render_scale=0.5,
        render_colors="red,blue",
        seed=42,
    )
    d = cfg.todict()
    cfg2 = Config.fromdict(d)
    d2 = cfg2.todict()
    for key in d:
        if key in ("timestamp", "command"):
            continue
        v1, v2 = d[key], d2[key]
        if isinstance(v1, tuple):
            v1 = list(v1)
        if isinstance(v2, tuple):
            v2 = list(v2)
        assert v1 == v2, f"round-trip mismatch on {key}: {v1} != {v2}"


def test_secondary_output_path():
    cfg = Config("video.mp4", output_path=["mjpeg:8080", "render.000.mp4"])
    assert cfg.get_secondary_output_path(".ckpt.zip") == "render.ckpt.zip"
    cfg = Config("video.mp4")
    assert cfg.get_secondary_output_path(".flow.zip") == "video.flow.zip"


def test_duplicate_layer_index():
    import pytest
    with pytest.raises(ValueError):
        Config("video.mp4", layers=[LayerConfig(0), LayerConfig(0)])
