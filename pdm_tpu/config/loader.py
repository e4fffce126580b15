"""Config loading: YAML root with per-group YAML indirection, auto-generated
CLI flags from the flattened pydantic tree, and the ``@with_config``
script decorator.

Capability parity: reference ``utils/utils.py:57-153`` (flatten_config,
parse_args_from_config, update_config_from_args, _materialize_group_paths,
load_config, with_config). Every leaf becomes a ``--group.field`` flag,
booleans get ``--no-`` variants.
"""

from __future__ import annotations

import argparse
import os
import typing
from functools import wraps
from typing import Any, Callable, Dict, Optional

import yaml
from pydantic import BaseModel

from .config import Config

DEFAULT_CONFIG_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "yaml", "config.yaml"
)


def flatten_config(config: BaseModel, parent_key: str = "") -> Dict[str, Any]:
    items = {}
    for k, v in config:
        key = f"{parent_key}.{k}" if parent_key else k
        if isinstance(v, BaseModel):
            items.update(flatten_config(v, key))
        else:
            items[key] = v
    return items


def _flatten_with_annotations(model: BaseModel, parent_key: str = ""):
    """(key, value, declared annotation) triples over the pydantic tree —
    the ANNOTATION drives CLI typing, so an Optional[int] field whose
    current value is None still parses as int (not str), and list-typed
    fields parse as YAML even when their default is None."""
    for name, field in type(model).model_fields.items():
        v = getattr(model, name)
        key = f"{parent_key}.{name}" if parent_key else name
        if isinstance(v, BaseModel):
            yield from _flatten_with_annotations(v, key)
        else:
            yield key, v, field.annotation


def _cli_kind(annotation: Any) -> Any:
    """'bool', a scalar type, or 'yaml' (parse the flag via yaml.safe_load).

    Handles both typing.Optional[X] and PEP 604 ``X | None`` (which has
    origin types.UnionType, not typing.Union), and maps Literal[...] of a
    uniform scalar type to that type — falling through to yaml would let
    YAML 1.1 coercion mangle string values ('no' -> False, 'on' -> True)."""
    import types as _types

    origin = typing.get_origin(annotation)
    if origin is typing.Union or origin is getattr(_types, "UnionType", ()):
        args = [a for a in typing.get_args(annotation) if a is not type(None)]
        if len(args) == 1:
            return _cli_kind(args[0])
        return "yaml"
    if origin is typing.Literal:
        value_types = {type(v) for v in typing.get_args(annotation)}
        if value_types == {str}:
            return str
        if len(value_types) == 1:
            return _cli_kind(value_types.pop())
        return "yaml"
    if annotation is bool:
        return "bool"
    if annotation in (int, float, str):
        return annotation
    return "yaml"


def parse_args_from_config(
    config: Config, argv: Optional[list] = None
) -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    for key, _value, annotation in _flatten_with_annotations(config):
        kind = _cli_kind(annotation)
        if kind == "bool":
            parser.add_argument(f"--{key}", action="store_true", default=None)
            parser.add_argument(
                f"--no-{key}", dest=key, action="store_false", default=None
            )
        elif kind == "yaml":
            parser.add_argument(
                f"--{key}", type=lambda s: yaml.safe_load(s), default=None
            )
        else:
            parser.add_argument(f"--{key}", type=kind, default=None)
    return parser.parse_args(argv)


def update_config_from_args(config: Config, args: argparse.Namespace) -> None:
    for arg_key, arg_value in vars(args).items():
        if arg_value is None:
            continue
        *heads, leaf = arg_key.split(".")
        sub = config
        for head in heads:
            sub = getattr(sub, head)
        setattr(sub, leaf, arg_value)


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def _materialize_group_paths(root: dict, base_dir: str) -> dict:
    """Top-level string values ending in .yaml are per-group config files;
    load them in place."""
    out: Dict[str, Any] = {}
    for key, val in root.items():
        if isinstance(val, str) and val.endswith((".yml", ".yaml")):
            path = val if os.path.isabs(val) else os.path.join(base_dir, val)
            out[key] = _load_yaml(path)
        else:
            out[key] = val
    return out


def load_config(config_path: Optional[str] = None) -> Config:
    path = config_path or os.environ.get("PDM_CONFIG", DEFAULT_CONFIG_PATH)
    root = _load_yaml(path)
    root = _materialize_group_paths(root, os.path.dirname(os.path.abspath(path)))
    return Config(**root)


def with_config(
    config_path: Optional[str] = None, *, parse_args: bool = False
) -> Callable:
    """Decorator injecting a loaded (and CLI-overridden) Config as the
    first argument of ``main``."""

    def decorator(func: Callable) -> Callable:
        @wraps(func)
        def wrapper(*args, **kwargs):
            config = load_config(config_path)
            if parse_args:
                update_config_from_args(config, parse_args_from_config(config))
            return func(config, *args, **kwargs)

        return wrapper

    return decorator
