"""Time-parameterized flow filters (scale / threshold / clip / polar).

Parity reference: transflow/flow/filters.py:15-87. Filters are pure functions
``flow, t -> flow`` applied inside the jitted per-frame step; the user
expressions are compiled once (utils/expr.py) and trace cleanly because the
exposed math namespace is jax-backed.
"""
import jax.numpy as jnp

from ..utils import parse_expression


class FlowFilter:

    def __call__(self, flow, t):
        raise NotImplementedError

    @classmethod
    def from_args(cls, name: str, args: tuple) -> "FlowFilter":
        registry = {"scale": (ScaleFilter, 1), "threshold": (ThresholdFilter, 1),
                    "clip": (ClipFilter, 1), "polar": (PolarFilter, 2)}
        if name not in registry:
            raise ValueError(f"Unknown flow filter {name!r}")
        filter_cls, arity = registry[name]
        if len(args) != arity:
            raise ValueError(
                f"Filter {name} takes {arity} argument(s), got {len(args)}")
        return filter_cls(*args)

    @staticmethod
    def iter_specs(filters_string: str | None) -> list[tuple[str, tuple]]:
        """Split 'name=expr;name=expr:expr;...' into (name, args) pairs —
        the single owner of the filters-string grammar (parse_many and
        static_clip_bound both build on it)."""
        if filters_string is None:
            return []
        specs = []
        for part in filters_string.strip().split(";"):
            if not part.strip():
                continue
            eq = part.index("=")
            specs.append((part[:eq].strip(),
                          tuple(part[eq + 1:].strip().split(":"))))
        return specs

    @classmethod
    def parse_many(cls, filters_string: str | None) -> list["FlowFilter"]:
        """Parse 'name=expr;name=expr:expr;...' into filter objects.

        Parity: transflow/flow/sources/source.py:142-150."""
        return [cls.from_args(name, args)
                for name, args in cls.iter_specs(filters_string)]


def static_clip_bound(filters_string: str | None) -> float | None:
    """Constant displacement bound guaranteed AFTER the whole filter
    chain, else None.

    Used to auto-derive the movement-gather halo for sharded runs: a
    ``clip=K`` filter with a numeric (t-independent) K bounds per-frame
    displacements by K — but only if no later filter can re-amplify them
    (filters apply in string order, so ``clip=4;scale=3`` reaches 12).
    Therefore the bound holds only when the LAST filter in the chain is
    the constant clip (threshold after clip also preserves it — it only
    zeroes vectors). Time-varying expressions give no static bound."""
    specs = FlowFilter.iter_specs(filters_string)
    bound = None
    for name, args in specs:
        if name == "clip":
            try:
                bound = float(args[0])
            except ValueError:
                bound = None  # dynamic clip: no static bound
        elif name == "threshold":
            continue  # only zeroes vectors: preserves any existing bound
        else:
            bound = None  # scale/polar can amplify: bound invalidated
    return bound


class ScaleFilter(FlowFilter):
    """flow *= expr(t)"""

    def __init__(self, expr: str):
        self.expr = parse_expression(expr)

    def __call__(self, flow, t):
        return flow * self.expr(t)


class ThresholdFilter(FlowFilter):
    """Zero out vectors with L2 norm <= expr(t)."""

    def __init__(self, expr: str):
        self.expr = parse_expression(expr)

    def __call__(self, flow, t):
        norm = jnp.linalg.norm(flow, axis=-1)
        return jnp.where((norm <= self.expr(t))[..., None],
                         jnp.zeros_like(flow), flow)


class ClipFilter(FlowFilter):
    """Rescale vectors with norm >= expr(t) down to that norm."""

    def __init__(self, expr: str):
        self.expr = parse_expression(expr)

    def __call__(self, flow, t):
        norm = jnp.linalg.norm(flow, axis=-1)
        threshold = self.expr(t)
        safe = jnp.where(norm > 0, norm, 1.0)
        factor = jnp.where(norm >= threshold, threshold / safe, 1.0)
        return flow * factor[..., None]


class PolarFilter(FlowFilter):
    """Remap (radius, angle) through two expressions of (t, r, a)."""

    def __init__(self, expr_radius: str, expr_theta: str):
        self.expr_radius = parse_expression(expr_radius, ("t", "r", "a"))
        self.expr_theta = parse_expression(expr_theta, ("t", "r", "a"))

    def __call__(self, flow, t):
        radius = jnp.linalg.norm(flow, axis=-1)
        theta = jnp.arctan2(flow[..., 1], flow[..., 0])
        new_radius = self.expr_radius(t, radius, theta)
        new_theta = self.expr_theta(t, radius, theta)
        return jnp.stack([new_radius * jnp.cos(new_theta),
                          new_radius * jnp.sin(new_theta)], axis=-1)
