"""Machine-local path configuration.

Rebuild of the reference's generated `local.py` EnvironmentSettings
(ViPT/lib/train/admin/environment.py:44+, tracking/create_default_local_file.py):
a per-machine YAML file mapping workspace and dataset roots, created with
defaults on first use.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, asdict

import yaml

DEFAULT_PATH = os.path.join(os.path.expanduser("~"), ".mmtrack_tpu", "local.yaml")

_DATASET_KEYS = [
    "depthtrack_dir", "cdtb_dir", "lasher_dir", "rgbt234_dir", "gtot_dir",
    "vtuav_dir", "visevent_dir", "lasot_dir", "got10k_dir", "coco_dir",
    "trackingnet_dir", "imagenet_dir", "otb_dir",
]


@dataclass
class EnvironmentSettings:
    workspace_dir: str = "./workspace"
    results_dir: str = "./workspace/results"
    checkpoints_dir: str = "./workspace/checkpoints"
    tensorboard_dir: str = "./workspace/tensorboard"
    pretrained_dir: str = "./pretrained"
    datasets: dict = field(default_factory=lambda: {k: "" for k in _DATASET_KEYS})

    def dataset_root(self, name: str) -> str:
        key = name.lower().split("_")[0] + "_dir"
        root = self.datasets.get(key, "")
        if not root:
            raise FileNotFoundError(
                f"dataset root for '{name}' not configured; edit {DEFAULT_PATH}")
        return root


def create_default_local_file(path: str = DEFAULT_PATH) -> str:
    """Write a default local.yaml (create_default_local_file analog)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(asdict(EnvironmentSettings()), f, default_flow_style=False)
    return path


def load_env_settings(path: str = DEFAULT_PATH) -> EnvironmentSettings:
    if not os.path.exists(path):
        create_default_local_file(path)
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    env = EnvironmentSettings()
    for k, v in data.items():
        if hasattr(env, k):
            setattr(env, k, v)
    return env


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA executable cache for every CLI entry point.

    First compile of the full ViT-B train step takes many minutes on a
    1-core host; with the cache it is paid once per (program, topology)
    and later runs deserialize in seconds. Safe to call repeatedly."""
    import os

    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
