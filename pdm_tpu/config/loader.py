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


def parse_args_from_config(
    config: Config, argv: Optional[list] = None
) -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    for key, value in flatten_config(config).items():
        if isinstance(value, bool):
            parser.add_argument(f"--{key}", action="store_true", default=None)
            parser.add_argument(
                f"--no-{key}", dest=key, action="store_false", default=None
            )
        else:
            arg_type = type(value) if value is not None else str
            if arg_type in (list, tuple, dict):
                parser.add_argument(
                    f"--{key}", type=lambda s: yaml.safe_load(s), default=None
                )
            else:
                parser.add_argument(f"--{key}", type=arg_type, default=None)
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
