"""Config system: YAML/JSON param files, recursive merge, dot-access dicts.

Parity with the reference config layer (`src/utils/helpfuns.py:114-134` —
`update_nested_values` recursive merge; `src/main.py:241-253` — `__common__.yml`
+ variant merge), re-implemented without the EasyDict dependency.
"""

from __future__ import annotations

import json
import os
from copy import deepcopy
from typing import Any

import yaml


class EDict(dict):
    """Dict with attribute (dot) access, recursively applied.

    Drop-in for the reference's `easydict.EasyDict` usage: nested dicts become
    EDicts on construction and on assignment; lists of dicts are converted too.
    """

    def __init__(self, d: dict | None = None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d)
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _convert(value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, EDict):
            return EDict(value)
        if isinstance(value, (list, tuple)):
            converted = [EDict._convert(v) for v in value]
            return type(value)(converted) if isinstance(value, tuple) else converted
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, EDict._convert(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __deepcopy__(self, memo):
        return EDict({k: deepcopy(v, memo) for k, v in self.items()})


def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def load_json(path: str) -> dict:
    with open(path, "r") as f:
        return json.load(f)


def save_json(data: Any, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f, indent=4)


def save_yaml(data: Any, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.dump(data, f, default_flow_style=False, sort_keys=False, indent=4)


def load_param_file(path: str) -> dict:
    """Load a .yml/.yaml/.json param file (reference `helpfuns.load_param_file`)."""
    if path.endswith(".json"):
        return load_json(path)
    if path.endswith((".yml", ".yaml")):
        return load_yaml(path)
    raise NotImplementedError(f"Unsupported param file type: {path}")


def update_nested_values(base: dict, target: dict, verbose: bool = False, _path: str = "") -> dict:
    """Recursively merge `target` into `base`, in place (reference semantics:
    `helpfuns.py:114-134` — leaves in `target` override leaves in `base`;
    missing subtrees are added wholesale).  Returns `base`.
    """
    for key, value in target.items():
        path = f"{_path}.{key}" if _path else str(key)
        if isinstance(value, dict):
            if key not in base or not isinstance(base.get(key), dict):
                base[key] = value
                if verbose:
                    print(f"config merge: ADDED subtree '{path}'")
                continue
            update_nested_values(base[key], value, verbose=verbose, _path=path)
        else:
            if verbose and key in base and base[key] != value:
                print(f"config merge: UPDATED '{path}': {base[key]} -> {value}")
            base[key] = value
    return base


def load_merged_params(params_path: str) -> EDict:
    """Load `<dir>/__common__.yml` merged with the variant file at `params_path`.

    Mirrors `main.py:241-253`: a variant under an `_others` directory looks one
    level up for the common file.
    """
    parent = os.path.split(params_path)[0]
    if "_others" in params_path:
        common_path = os.path.join(parent, "..", "__common__.yml")
    else:
        common_path = os.path.join(parent, "__common__.yml")
    if os.path.isfile(common_path):
        parameters = load_param_file(common_path)
    else:
        parameters = {}
    specific = load_param_file(params_path)
    if os.path.abspath(params_path) != os.path.abspath(common_path):
        update_nested_values(parameters, specific)
    return EDict(parameters)
