"""Estimator tuning-window logic (tk-free parts) + headless construction."""
import os

import pytest

from transflow_tpu.flow.sources.cv import CvFlowConfig
from transflow_tpu.gui.tuning import (FIELDS, FIELD_KINDS, FIELD_SPECS,
                                      CvFlowConfigWindow, coerce_value)


def test_fields_match_config_schema():
    """Every tuning row must edit a real CvFlowConfig attribute, and its
    default must survive a round trip through the widget-string coercion."""
    for attr, label, kind, spec in FIELDS:
        assert attr in CvFlowConfig.DEFAULTS, attr
        default = CvFlowConfig.DEFAULTS[attr]
        assert coerce_value(kind, str(default)) == default
        if kind in ("int", "float"):
            lo, hi = spec
            assert lo <= default <= hi, (attr, default, spec)
        else:
            assert default in spec


def test_coerce_value():
    assert coerce_value("int", "7") == 7
    assert coerce_value("float", "0.5") == 0.5
    assert coerce_value("choice", "farneback") == "farneback"
    with pytest.raises(ValueError):
        coerce_value("int", "not-a-number")
    with pytest.raises(ValueError):
        coerce_value("float", "")


def test_apply_value_updates_config_and_bumps_version():
    config = CvFlowConfig()
    window = CvFlowConfigWindow(config)
    v0 = config.version
    assert window.apply_value("fb_levels", "5")
    assert config.fb_levels == 5
    assert config.version > v0


def test_apply_value_tolerates_half_typed_input():
    """Widget handlers fire per keystroke; unparseable text must neither
    raise nor touch the config."""
    config = CvFlowConfig()
    window = CvFlowConfigWindow(config)
    before = config.to_dict()
    v0 = config.version
    assert not window.apply_value("fb_levels", "")
    assert not window.apply_value("fb_levels", "abc")
    assert not window.apply_value("fb_poly_sigma", "-")
    assert config.to_dict() == before
    assert config.version == v0


def test_window_construction_headless():
    """Construct the tk window only when a display is available."""
    if not os.environ.get("DISPLAY"):
        pytest.skip("no DISPLAY; tk window cannot be created headlessly")
    import tkinter
    try:
        root = tkinter.Tk()
    except tkinter.TclError:
        pytest.skip("tk cannot open the display")
    root.destroy()
    window = CvFlowConfigWindow(CvFlowConfig())
    window.start()
    window.thread.join(timeout=0.1)


def test_field_specs_lookup_tables():
    assert FIELD_KINDS["method"] == "choice"
    assert FIELD_SPECS["fb_levels"] == (1, 8)
