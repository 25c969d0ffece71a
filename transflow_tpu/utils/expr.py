"""Safe user-expression evaluator.

Parity reference: transflow/utils.py:409-414 (parse_lambda_expression, a raw
``eval``) and USAGE.md:283 (expressions may use ``t``/``r``/``a`` variables and
the ``math``/``random``/``numpy`` namespaces).

Unlike the reference, expressions are AST-validated against a whitelist before
compilation: only literals, arithmetic/boolean/comparison operators, ternaries
and calls/attribute-reads into the exposed namespaces are allowed, which rules
out dunder-based sandbox escapes. Array-valued variables (polar filter's ``r``
and ``a``) work both on numpy arrays and on jax tracers because the exposed
``numpy``/``np``/``math`` function sets are backed by jax.numpy.
"""
import ast
import math
import random
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

_ALLOWED_NODES = (
    ast.Expression, ast.Constant, ast.Name, ast.Load,
    ast.BinOp, ast.UnaryOp, ast.BoolOp, ast.Compare, ast.IfExp,
    ast.Call, ast.Attribute, ast.Tuple, ast.List, ast.Subscript, ast.Slice,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.USub, ast.UAdd, ast.Not, ast.Invert,
    ast.And, ast.Or, ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.BitAnd, ast.BitOr, ast.BitXor, ast.LShift, ast.RShift,
)

_MODULES = {"math", "numpy", "np", "random"}


class _MathShim:
    """math-like namespace: f64 ``math`` for plain scalars (the reference
    evaluates expressions with raw ``eval`` + math, double precision —
    fuzzing caught jnp's f32 trig drifting at large arguments, e.g.
    cos(3124.5) off by 1e-4 relative), jax.numpy when any argument is an
    array/tracer so polar-filter expressions still trace."""

    pi = math.pi
    e = math.e
    tau = math.tau
    inf = math.inf

    def __getattr__(self, name):
        math_fn = getattr(math, name, None)
        jnp_fn = getattr(jnp, name, None)
        if math_fn is None and jnp_fn is None:
            raise AttributeError(name)
        if math_fn is None:
            return jnp_fn
        if jnp_fn is None:
            return math_fn

        def dispatch(*args, **kwargs):
            if any(isinstance(a, (jax.Array, np.ndarray))
                   for a in args):
                return jnp_fn(*args, **kwargs)
            return math_fn(*args, **kwargs)

        return dispatch


_GLOBALS = {
    # __import__ is needed by jax.numpy's lazy module __getattr__; it is NOT
    # reachable from expressions: the AST whitelist rejects any name that is
    # not an exposed variable/module before compilation.
    "__builtins__": {"__import__": __import__},
    "math": _MathShim(),
    "numpy": jnp,
    "np": jnp,
    "random": random,
    "abs": abs, "min": min, "max": max, "round": round,
    "float": float, "int": int, "bool": bool, "len": len,
    "pi": math.pi, "e": math.e,
}


def _validate(tree: ast.AST, variables: Sequence[str]):
    allowed_names = set(variables) | _MODULES | {
        "abs", "min", "max", "round", "float", "int", "bool", "len", "pi", "e"}
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(
                f"Expression uses disallowed syntax: {type(node).__name__}")
        if isinstance(node, ast.Name) and node.id not in allowed_names:
            raise ValueError(f"Unknown name in expression: {node.id!r}")
        if isinstance(node, ast.Attribute):
            if node.attr.startswith("_"):
                raise ValueError("Private attribute access is not allowed")
            if not (isinstance(node.value, ast.Name)
                    and node.value.id in _MODULES):
                raise ValueError(
                    "Attribute access is only allowed on math/numpy/random")


def parse_expression(expr_string: str,
                     variables: Sequence[str] = ("t",)) -> Callable:
    """Compile a user expression into a callable of ``variables``.

    ``parse_expression("0.5 * t")(2.0) == 1.0``; array variables are supported
    (e.g. the polar filter calls with ``(t, r, a)`` where r/a are (H, W)).
    """
    tree = ast.parse(expr_string, mode="eval")
    _validate(tree, variables)
    code = compile(tree, "<transflow-expression>", "eval")

    def fn(*args):
        if len(args) != len(variables):
            raise TypeError(
                f"Expression takes {len(variables)} arguments, got {len(args)}")
        scope = dict(zip(variables, args))
        return eval(code, _GLOBALS, scope)  # noqa: S307 — AST-whitelisted above

    fn.__doc__ = f"user expression: {expr_string!r} over {tuple(variables)}"
    return fn


def parse_lock_intervals(expr_string: str) -> tuple[tuple[float, float], ...]:
    """Parse a lock 'stay' expression: a list of (start, duration) couples.

    Parity reference: transflow/flow/sources/source.py:134-138 (an ``eval`` of
    the bracketed string); here it is ``ast.literal_eval``-based.
    """
    text = expr_string.strip()
    if "(" not in text:
        text = f"({text})"
    value = ast.literal_eval(f"[{text},]")
    out = []
    for couple in value:
        if not (isinstance(couple, tuple) and len(couple) == 2):
            raise ValueError(
                f"Lock expression items must be (start, duration): {couple!r}")
        out.append((float(couple[0]), float(couple[1])))
    return tuple(out)
