"""Config system: attribute-dict tree with strict YAML overlay.

Unifies the reference's four config mechanisms (SURVEY.md section 5.6) into one:
a default tree defined in code per experiment family, overlaid by a YAML file
with strict unknown-key rejection (behavior of
ViPT/lib/config/vipt/config.py:128-149), and dumped back to YAML.
"""

from __future__ import annotations

import copy
from typing import Any

import yaml


class ConfigNode(dict):
    """Dict with attribute access. Nested dicts are converted recursively."""

    def __init__(self, d: dict | None = None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = ConfigNode(v) if isinstance(v, dict) else v

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = ConfigNode(value) if isinstance(value, dict) and not isinstance(value, ConfigNode) else value

    def clone(self) -> "ConfigNode":
        return copy.deepcopy(self)

    def merge_from_dict(self, other: dict, _path: str = "") -> None:
        """Overlay `other` onto self; unknown keys raise (strict-key check)."""
        for k, v in other.items():
            here = f"{_path}.{k}" if _path else k
            if k not in self:
                raise KeyError(f"config key '{here}' does not exist in the default config")
            if isinstance(v, dict):
                if not isinstance(self[k], ConfigNode):
                    raise TypeError(f"config key '{here}' is a leaf in the default config, got a mapping")
                self[k].merge_from_dict(v, here)
            else:
                self[k] = v

    def merge_from_yaml(self, path: str) -> None:
        with open(path) as f:
            overlay = yaml.safe_load(f) or {}
        self.merge_from_dict(overlay)

    def to_dict(self) -> dict:
        return {k: (v.to_dict() if isinstance(v, ConfigNode) else v) for k, v in self.items()}

    def dump_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, default_flow_style=False)


def vipt_default_config() -> ConfigNode:
    """Default config tree for the ViPT/OSTrack family.

    Mirrors the key surface of ViPT/lib/config/vipt/config.py:7-106 so the
    reference's experiment YAMLs (ViPT/experiments/vipt/*.yaml) overlay
    unchanged onto this tree.
    """
    return ConfigNode({
        "MODEL": {
            "PRETRAIN_FILE": "",
            "EXTRA_MERGER": False,
            "RETURN_INTER": False,
            "RETURN_STAGES": [],
            "BACKBONE": {
                "TYPE": "vit_base_patch16_224",
                # ViT-B geometry by default; overridable so demo/CI
                # configs can train CPU-sized models through the same
                # tools/train.py path (the reference selects variants via
                # TYPE only, config.py:23)
                "EMBED_DIM": 768,
                "DEPTH": 12,
                "NUM_HEADS": 12,
                "STRIDE": 16,
                "MID_PE": False,
                "SEP_SEG": False,
                "CAT_MODE": "direct",
                "MERGE_LAYER": 0,
                "ADD_CLS_TOKEN": False,
                "CLS_TOKEN_USE_MODE": "ignore",
                "CE_LOC": [],
                "CE_KEEP_RATIO": [],
                "CE_TEMPLATE_RANGE": "ALL",  # ALL | CTR_POINT | CTR_REC | GT_BOX
            },
            "HEAD": {
                "TYPE": "CENTER",
                "NUM_CHANNELS": 256,
            },
        },
        "TRAIN": {
            "PROMPT": {"TYPE": "vipt_deep"},  # vipt_deep | vipt_shaw | none
            "LR": 1e-4,
            "WEIGHT_DECAY": 1e-4,
            "EPOCH": 500,
            "LR_DROP_EPOCH": 400,
            "BATCH_SIZE": 16,
            "NUM_WORKER": 8,
            "OPTIMIZER": "ADAMW",
            "BACKBONE_MULTIPLIER": 0.1,
            "GIOU_WEIGHT": 2.0,
            "L1_WEIGHT": 5.0,
            "FOCAL_WEIGHT": 1.0,
            "FREEZE_LAYERS": [0],
            "PRINT_INTERVAL": 50,
            "VAL_EPOCH_INTERVAL": 20,
            "GRAD_CLIP_NORM": 0.1,
            "AMP": False,           # on TPU this selects bf16 compute
            "FIX_BN": True,
            "SAVE_EPOCH_INTERVAL": 1,
            "SAVE_LAST_N_EPOCH": 1,
            "CE_START_EPOCH": 20,
            "CE_WARM_EPOCH": 80,
            "DROP_PATH_RATE": 0.1,
            "SCHEDULER": {"TYPE": "step", "DECAY_RATE": 0.1},
        },
        "DATA": {
            "SAMPLER_MODE": "causal",
            "MEAN": [0.485, 0.456, 0.406],
            "STD": [0.229, 0.224, 0.225],
            "MAX_SAMPLE_INTERVAL": 200,
            "TRAIN": {
                "DATASETS_NAME": ["LASOT", "GOT10K_vottrain"],
                "DATASETS_RATIO": [1, 1],
                "SAMPLE_PER_EPOCH": 60000,
            },
            "VAL": {
                "DATASETS_NAME": [],
                "DATASETS_RATIO": [1],
                "SAMPLE_PER_EPOCH": 10000,
            },
            "SEARCH": {
                "SIZE": 320,
                "FACTOR": 5.0,
                "CENTER_JITTER": 4.5,
                "SCALE_JITTER": 0.5,
                "NUMBER": 1,
            },
            "TEMPLATE": {
                "NUMBER": 1,
                "SIZE": 128,
                "FACTOR": 2.0,
                "CENTER_JITTER": 0,
                "SCALE_JITTER": 0,
            },
        },
        "TEST": {
            "TEMPLATE_FACTOR": 2.0,
            "TEMPLATE_SIZE": 128,
            "SEARCH_FACTOR": 5.0,
            "SEARCH_SIZE": 320,
            "EPOCH": 500,
        },
    })


# Experiment presets matching ViPT/experiments/vipt/{deep,shaw}_{rgbd,rgbt,rgbe}.yaml.
# The six reference YAMLs differ only in dataset names, prompt type and batch
# size (SURVEY.md section 2.1); we encode them as (datasets, prompt, sizes).
_VIPT_EXPERIMENTS = {
    "deep_rgbd": {"datasets": ["DepthTrack_train"], "val": ["DepthTrack_val"], "prompt": "vipt_deep"},
    "shaw_rgbd": {"datasets": ["DepthTrack_train"], "val": ["DepthTrack_val"], "prompt": "vipt_shaw"},
    "deep_rgbt": {"datasets": ["LasHeR_all"], "val": ["LasHeR_val"], "prompt": "vipt_deep"},
    "shaw_rgbt": {"datasets": ["LasHeR_all"], "val": ["LasHeR_val"], "prompt": "vipt_shaw"},
    "deep_rgbe": {"datasets": ["VisEvent_train"], "val": ["VisEvent_val"], "prompt": "vipt_deep"},
    "shaw_rgbe": {"datasets": ["VisEvent_train"], "val": ["VisEvent_val"], "prompt": "vipt_shaw"},
}


def vipt_experiment_config(name: str) -> ConfigNode:
    """Build the config for a named ViPT experiment (e.g. 'deep_rgbd').

    Values mirror ViPT/experiments/vipt/deep_rgbd.yaml:1-79 (all six configs
    share these sizes/schedules).
    """
    if name not in _VIPT_EXPERIMENTS:
        raise KeyError(f"unknown ViPT experiment '{name}'; options: {sorted(_VIPT_EXPERIMENTS)}")
    exp = _VIPT_EXPERIMENTS[name]
    cfg = vipt_default_config()
    cfg.merge_from_dict({
        "MODEL": {
            "BACKBONE": {
                "TYPE": "vit_base_patch16_224_ce_prompt",
                "CE_LOC": [3, 6, 9],
                "CE_KEEP_RATIO": [0.7, 0.7, 0.7],
                "CE_TEMPLATE_RANGE": "CTR_POINT",
            },
        },
        "TRAIN": {
            "PROMPT": {"TYPE": exp["prompt"]},
            "BATCH_SIZE": 32,
            "EPOCH": 60,
            "LR": 4e-4,
            "LR_DROP_EPOCH": 48,
            "CE_START_EPOCH": 4,
            "CE_WARM_EPOCH": 16,
            "VAL_EPOCH_INTERVAL": 5,
            "SAVE_EPOCH_INTERVAL": 5,
        },
        "DATA": {
            "SEARCH": {"SIZE": 256, "FACTOR": 4.0, "CENTER_JITTER": 3, "SCALE_JITTER": 0.25},
            "TRAIN": {"DATASETS_NAME": exp["datasets"], "DATASETS_RATIO": [1] * len(exp["datasets"])},
            "VAL": {"DATASETS_NAME": exp["val"], "DATASETS_RATIO": [1] * len(exp["val"])},
        },
        "TEST": {"SEARCH_FACTOR": 4.0, "SEARCH_SIZE": 256, "EPOCH": 60},
    })
    return cfg
