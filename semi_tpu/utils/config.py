"""YAML config loading with constructor-kwarg validation.

The extensibility contract (reference README.md:22, train.py:58): each
model's YAML section keys are passed verbatim as constructor kwargs.
Here that contract is VALIDATED at load time — unknown keys raise with
the offending name instead of a deep TypeError (this would have caught
the reference's GTSA ``time_dim``/``model_dim`` drift, SURVEY.md §5.6).
"""

from __future__ import annotations

import inspect

import yaml

__all__ = ["load_config", "validate_model_section"]


def load_config(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f.read())


def validate_model_section(model_cls, section: dict, name: str) -> dict:
    """Check section keys against the constructor; returns the kwargs."""
    sig = inspect.signature(model_cls.__init__)
    accepts_kwargs = any(
        p.kind == inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values())
    params = set(sig.parameters) - {"self"}
    unknown = set(section) - params
    if unknown and not accepts_kwargs:
        raise ValueError(
            f"config section '{name}' has keys {sorted(unknown)} not accepted "
            f"by {model_cls.__name__}.__init__ ({sorted(params)})")
    missing = {
        p for p, v in sig.parameters.items()
        if p != "self" and v.default is inspect.Parameter.empty
        and v.kind not in (inspect.Parameter.VAR_KEYWORD,
                           inspect.Parameter.VAR_POSITIONAL)
    } - set(section)
    if missing:
        raise ValueError(
            f"config section '{name}' missing required keys {sorted(missing)}")
    return dict(section)
