"""CLI flag surface: USAGE parity, full-flag round trip into Config.

Guards two invariants: (1) every flag the parser accepts is documented in
USAGE.md with that exact spelling; (2) a command line exercising every flag
group lands in the right Config/LayerConfig/PixmapSourceConfig fields
(mirrors the reference's positional mini-language,
transflow/__init__.py:21-481).
"""
import os
import re

import pytest

from transflow_tpu.cli import build_parser, config_from_args

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def all_long_flags():
    parser = build_parser()
    flags = set()
    for action in parser._actions:
        for option in action.option_strings:
            if option.startswith("--"):
                flags.add(option)
    return flags


def test_every_flag_documented_in_usage():
    usage = open(os.path.join(REPO, "USAGE.md"), encoding="utf8").read()
    undocumented = sorted(flag for flag in all_long_flags()
                          if flag not in usage and flag != "--help")
    assert not undocumented, f"USAGE.md missing flags: {undocumented}"


def test_usage_documents_no_phantom_flags():
    """Flags mentioned in USAGE.md must actually exist (docs can't drift
    ahead of the parser)."""
    usage = open(os.path.join(REPO, "USAGE.md"), encoding="utf8").read()
    known = all_long_flags()
    mentioned = set(re.findall(r"(?<![\w-])--[a-z][a-z-]+", usage))
    # allow the extra-tools' own flags and shorthand like --move-mask-*
    allowed_foreign = known | {"--stats"}
    phantom = sorted(m for m in mentioned
                     if m not in allowed_foreign and m != "--"
                     and not any(k.startswith(m) for k in known))
    assert not phantom, f"USAGE.md documents unknown flags: {phantom}"


def test_full_flag_round_trip(tmp_path):
    import numpy as np
    kernel = str(tmp_path / "k.npy")
    np.save(kernel, np.ones((3, 3)) / 9.0)
    argv = [
        "flow.mp4",
        "--flow", "extra.mp4",
        "--merge", "absmax",
        "--mask", "circle:25%",
        "--kernel", kernel,
        "-f", "scale=2; threshold=0.5",
        "-d", "forward",
        "-s", "00:00:05",
        "-t", "00:00:10",
        "--to", "00:00:20",
        "--repeat", "2",
        "--lock", "stay", "(1, 0.5)",
        "-p", "image.jpg", "0", "1",
        "-i", "border-left:50%",
        "--alteration", "overlay.png",
        "--pixmap-seek", "00:00:01",
        "--pixmap-repeat", "3",
        "-p", "noise", "1",
        "--background", "#102030",
        "-l", "0", "moveref",
        "--mask-alpha", "ones",
        "--move-mask-source", "ones",
        "--move-mask-destination", "ones",
        "--move-from-empty",
        "--no-move-to-empty",
        "--no-move-to-filled",
        "-e",
        "-r", "random", "0.25",
        "-m", "border:10",
        "--reset-source",
        "-l", "1", "introduction",
        "--no-introduce-on-empty",
        "--no-introduce-on-filled",
        "--no-introduce-moving",
        "--no-introduce-unmoving",
        "-n",
        "-a",
        "--introduce-on-all-empty",
        "-o", "out.mp4",
        "-o", "mjpeg:9000",
        "--vcodec", "libx264",
        "--size", "640x480",
        "--view-flow",
        "--render-scale", "0.2",
        "--render-colors", "#ff0,#00f,#f0f,#0f0",
        "--render-binary",
        "--seed", "42",
        "--batch-frames", "8",
    ]
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    assert cfg.flow_path == "flow.mp4"
    assert cfg.extra_flow_paths == ["extra.mp4"]
    assert cfg.flows_merging_function == "absmax"
    assert cfg.mask_path == "circle:25%"
    assert cfg.kernel_path == kernel
    assert cfg.flow_filters == "scale=2; threshold=0.5"
    assert str(cfg.direction) in ("forward", "Direction.FORWARD")
    assert cfg.repeat == 2
    from transflow_tpu.flow import LockMode
    assert LockMode.from_arg(cfg.lock_mode) == LockMode.STAY
    assert cfg.lock_expr == "(1, 0.5)"
    # pixmap mini-language: flags attach to the LAST -p
    assert len(cfg.pixmap_sources) == 2
    first = cfg.pixmap_sources[0]
    assert first.path == "image.jpg" and first.layers == [0, 1]
    assert first.introduction_path == "border-left:50%"
    assert first.alteration_path == "overlay.png"
    assert first.repeat == 3
    assert cfg.pixmap_sources[1].path == "noise"
    assert cfg.pixmap_sources[1].layers == [1]
    # layer mini-language: flags attach to the LAST -l
    layer0 = next(l for l in cfg.layers if l.index == 0)
    layer1 = next(l for l in cfg.layers if l.index == 1)
    assert layer0.classname == "moveref"
    assert layer0.transparent_pixels_can_move is True
    assert layer0.pixels_can_move_to_empty_spot is False
    assert layer0.pixels_can_move_to_filled_spot is False
    assert layer0.moving_pixels_leave_empty_spot is True
    assert layer0.reset_mode == "random"
    assert layer0.reset_random_factor == 0.25
    assert layer0.reset_mask == "border:10"
    assert layer0.reset_source is True
    assert layer1.classname == "introduction"
    assert layer1.introduce_pixels_on_empty_spots is False
    assert layer1.introduce_pixels_on_filled_spots is False
    assert layer1.introduce_moving_pixels is False
    assert layer1.introduce_unmoving_pixels is False
    assert layer1.introduce_once is True
    assert layer1.introduce_on_all_filled_spots is True
    assert layer1.introduce_on_all_empty_spots is True
    # layer-0 flags must NOT leak onto layer 1
    assert layer1.moving_pixels_leave_empty_spot is not True
    assert cfg.compositor_background == "#102030"
    assert cfg.output_path == ["out.mp4", "mjpeg:9000"]
    assert cfg.vcodec == "libx264"
    assert cfg.view_flow is True
    assert cfg.render_scale == 0.2
    assert cfg.render_binary is True
    assert cfg.seed == 42
    assert cfg.batch_frames == 8


def test_reset_default_factors():
    args = build_parser().parse_args(["f.mp4", "-l", "0", "-r", "constant"])
    cfg = config_from_args(args)
    assert cfg.layers[0].reset_constant_step == 1.0
    args = build_parser().parse_args(["f.mp4", "-l", "0", "-r", "random"])
    cfg = config_from_args(args)
    assert cfg.layers[0].reset_random_factor == 0.1


def test_layer_flag_without_layer_creates_default():
    # reference: layer flags with no -l implicitly target layer 0
    args = build_parser().parse_args(["f.mp4", "-r", "linear", "0.05"])
    cfg = config_from_args(args)
    assert cfg.layers[0].index == 0
    assert cfg.layers[0].reset_mode == "linear"


def test_bad_values_rejected():
    parser = build_parser()
    with pytest.raises(SystemExit):
        parser.parse_args(["f.mp4", "-l", "zero"])
    with pytest.raises(SystemExit):
        parser.parse_args(["f.mp4", "-r", "bogus"])
    with pytest.raises(SystemExit):
        parser.parse_args(["f.mp4", "--lock", "stay"])
    with pytest.raises(SystemExit):
        parser.parse_args(["f.mp4", "-i", "ones"])  # -i before any -p
