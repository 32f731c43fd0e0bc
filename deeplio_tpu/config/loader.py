"""YAML config loading (reference: PyYAML ``safe_load`` of root config.yaml
in the CLI entry — SURVEY.md §1 L1)."""

from __future__ import annotations

from typing import Any, Dict

import yaml

from deeplio_tpu.config.schema import Config


def load_config(path: str) -> Config:
    with open(path, "r") as f:
        d: Dict[str, Any] = yaml.safe_load(f) or {}
    return Config.from_dict(d)


def load_config_dict(d: Dict[str, Any]) -> Config:
    return Config.from_dict(d)
