"""Dataclass → argparse bridge (stand-in for tyro, reference cleanba_ppo.py:410).

Turns a (possibly nested-free) dataclass into CLI flags:

- field ``foo_bar: int = 3``      -> ``--foo-bar 4``
- field ``flag: bool = False``    -> ``--flag`` / ``--no-flag``
- field ``xs: List[int] = [1,2]`` -> ``--xs 1 2 3``
- ``Optional[T]`` accepts the literal ``None``.

Docstring-style help: the reference attaches help as bare strings following each
field (PEP 224 style, cleanba_ppo.py:34-118); we read those from the class source.
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
import inspect
import sys
import typing
from typing import Any, List, Optional, Sequence, Type, TypeVar

T = TypeVar("T")


def _field_docs(cls: type) -> dict:
    """Extract PEP-224-style field docstrings (``x: int = 0`` followed by a str)."""
    docs = {}
    try:
        src = inspect.getsource(cls)
        tree = ast.parse(src).body[0]
    except (OSError, TypeError, SyntaxError, IndexError):
        return docs
    prev_name = None
    for node in getattr(tree, "body", []):
        if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            prev_name = node.target.id
        elif (
            isinstance(node, ast.Expr)
            and isinstance(node.value, ast.Constant)
            and isinstance(node.value.value, str)
            and prev_name
        ):
            docs[prev_name] = node.value.value
            prev_name = None
        else:
            prev_name = None
    return docs


def _unwrap_optional(tp):
    """Optional[T] -> (T, True); otherwise (tp, False)."""
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0], True
    return tp, False


def _scalar_parser(tp):
    if tp is bool:
        def parse_bool(s: str) -> bool:
            if s.lower() in ("1", "true", "yes", "on"):
                return True
            if s.lower() in ("0", "false", "no", "off"):
                return False
            raise argparse.ArgumentTypeError(f"invalid bool: {s!r}")
        return parse_bool
    return tp


def add_dataclass_args(parser: argparse.ArgumentParser, cls: type) -> None:
    docs = _field_docs(cls)
    hints = typing.get_type_hints(cls)
    for f in dataclasses.fields(cls):
        if not f.init or f.metadata.get("cli", True) is False:
            continue
        tp, is_opt = _unwrap_optional(hints.get(f.name, f.type))
        flag = "--" + f.name.replace("_", "-")
        help_txt = docs.get(f.name, "")
        if f.default is not dataclasses.MISSING:
            default = f.default
        elif f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
            default = f.default_factory()  # type: ignore[misc]
        else:
            default = None
        origin = typing.get_origin(tp)
        if tp is bool:
            group = parser.add_mutually_exclusive_group()
            group.add_argument(flag, dest=f.name, action="store_true", help=help_txt)
            group.add_argument(
                "--no-" + f.name.replace("_", "-"), dest=f.name, action="store_false"
            )
            parser.set_defaults(**{f.name: default})
        elif origin in (list, typing.List) or tp in (list, List):
            (elem,) = typing.get_args(tp) or (str,)
            parser.add_argument(
                flag, dest=f.name, nargs="*", type=_scalar_parser(elem),
                default=default, help=help_txt,
            )
        else:
            def mk(tp_, opt_):
                def parse(s: str):
                    if opt_ and s == "None":
                        return None
                    return tp_(s)
                return parse
            parser.add_argument(
                flag, dest=f.name, type=mk(tp, is_opt), default=default, help=help_txt
            )


def parse_cli(cls: Type[T], argv: Optional[Sequence[str]] = None, description: str = "") -> T:
    """Parse argv into an instance of dataclass `cls` (tyro.cli equivalent)."""
    parser = argparse.ArgumentParser(
        description=description or (cls.__doc__ or "").strip(),
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_dataclass_args(parser, cls)
    ns = parser.parse_args(sys.argv[1:] if argv is None else list(argv))
    names = {f.name for f in dataclasses.fields(cls) if f.init}
    kwargs: dict[str, Any] = {k: v for k, v in vars(ns).items() if k in names}
    return cls(**kwargs)
