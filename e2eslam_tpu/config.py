"""YAML config system with dot-access namespaces.

Capability parity with the reference's config layer
(``utils/yaml_configs.py:6-28`` + ``utils/arguments.py:4-11``): YAML files
with the section/flag names of ``configs/config.yaml`` load into a
dot-accessible namespace; configs can be snapshotted back to disk. We avoid
the ``easydict`` dependency with a tiny dict subclass.
"""

from __future__ import annotations

import argparse
import copy
import os
from typing import Any, Mapping

import yaml


class Config(dict):
    """A dict with attribute access, recursively applied."""

    def __init__(self, data: Mapping[str, Any] | None = None, **kwargs):
        super().__init__()
        data = dict(data or {})
        data.update(kwargs)
        for key, value in data.items():
            self[key] = value

    def __setitem__(self, key, value):
        if isinstance(value, Mapping) and not isinstance(value, Config):
            value = Config(value)
        elif isinstance(value, list):
            value = [Config(v) if isinstance(v, Mapping) else v for v in value]
        super().__setitem__(key, value)

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as exc:
            raise AttributeError(key) from exc

    def to_dict(self) -> dict:
        out = {}
        for key, value in self.items():
            if isinstance(value, Config):
                out[key] = value.to_dict()
            elif isinstance(value, list):
                out[key] = [v.to_dict() if isinstance(v, Config) else v for v in value]
            else:
                out[key] = value
        return out

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def merged(self, other: Mapping[str, Any]) -> "Config":
        """Deep-merge ``other`` on top of this config (returns a new Config)."""
        out = self.copy()
        for key, value in Config(other).items():
            if key in out and isinstance(out[key], Config) and isinstance(value, Config):
                out[key] = out[key].merged(value)
            else:
                out[key] = value
        return out


def load_yaml(path: str) -> Config:
    """Load a YAML config file into a dot-access namespace."""
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    return Config(data or {})


def save_yaml(config: Config, path: str | None = None) -> str:
    """Snapshot a config to ``SETTINGS.log_path`` (or an explicit path)."""
    if path is None:
        log_path = config.get("SETTINGS", {}).get("log_path") or "."
        name = config.get("SETTINGS", {}).get("name", "run")
        os.makedirs(log_path, exist_ok=True)
        path = os.path.join(log_path, f"{name}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(config.to_dict(), f, sort_keys=False)
    return path


def default_config_path() -> str:
    """Path of the shipped default config (mirrors the reference's sections)."""
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs", "config.yaml")


def arguments(argv=None) -> dict:
    """CLI of the reference drivers: ``--config_path`` and ``--name``,
    plus ``--data_path`` (overrides DATA.data_path so the real-dataset
    runs from tools/fetch_datasets.sh are turnkey without config edits).
    """
    parser = argparse.ArgumentParser(description="e2eslam_tpu")
    parser.add_argument("--config_path", type=str, default=default_config_path())
    parser.add_argument("--name", type=str, default="run")
    parser.add_argument("--data_path", type=str, default=None)
    args = parser.parse_args(argv)
    return vars(args)


def load_config(argv=None) -> Config:
    """Parse CLI args and return the loaded config with SETTINGS.name set."""
    args = arguments(argv)
    config = load_yaml(args["config_path"])
    config.SETTINGS.name = args["name"]
    if args.get("data_path"):
        config.DATA.data_path = args["data_path"]
    enable_compilation_cache()
    return config


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on the persistent XLA compilation cache.

    The flagship refinement step is a large XLA program (CNN fwd+bwd + view
    synthesis + Pallas KNN + fusion); first compilation takes minutes on the
    tunneled TPU. Caching it on disk makes every later run start in seconds.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
