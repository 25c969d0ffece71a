from .colors import (CSS4_COLORS, compose_additive, compose_average,
                     compose_subtractive, compose_top, parse_color)
from .masks import load_bool_mask, load_float_mask
from .expr import parse_expression, parse_lock_intervals
from .misc import find_unique_path, parse_size, parse_timestamp, startfile

__all__ = [
    "CSS4_COLORS", "parse_color", "compose_top", "compose_additive",
    "compose_subtractive", "compose_average",
    "load_bool_mask", "load_float_mask",
    "parse_expression", "parse_lock_intervals",
    "find_unique_path", "parse_size", "parse_timestamp", "startfile",
]
