"""One dataclass config tree for the whole framework.

Replaces the reference's dual config system (argparse trial flags +
yacs CfgNode YAML for DATOR — SURVEY.md §5 "Config / flag system") with a
single nested-dataclass tree that merges, in order:

    defaults -> YAML file -> dotted CLI overrides ("a.b.c=value")

mirroring the yacs `merge_from_file` / `merge_from_list` workflow
(dator/train.py:46-49) without the yacs dependency.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from .models.dator.transreid_vit import TransReIDConfig
from .models.dator.fourdnet import FourDNetConfig
from .models.dator.train import TrainConfig


@dataclasses.dataclass
class DataConfig:
    root: str = "./data/reid"
    height: int = 256
    width: int = 128
    batch_size: int = 64           # config.yml SOLVER.IMS_PER_BATCH
    num_instances: int = 4         # DATALOADER.NUM_INSTANCE (P x K)
    seed: int = 0
    # ship u8 rgb + single-channel u16 depth and dequantize on device —
    # ~4.8x smaller host->device upload (the binding constraint for
    # tunneled on-chip training, PERF.md); numerically within input
    # quantization (<=1.5e-5 after normalization) of the f32 path
    quantize_upload: bool = True
    # keep the WHOLE quantized dataset device-resident and gather batches
    # on device by index (~tens of bytes uploaded per step instead of the
    # batch tensors). "auto" = on when the quantized dataset is under
    # device_dataset_max_mb; true/false force it.
    device_dataset: Any = "auto"
    device_dataset_max_mb: int = 512
    # held-out split for eval (dir-per-instance root, same layout as
    # `root`). Empty = eval on the training samples (the r3 behavior —
    # fine for throughput work, but rank-1 on train measures memorization,
    # not re-identification; VERDICT r3 item 1 wants val rank1)
    val_root: str = ""


@dataclasses.dataclass
class EvalConfig:
    period: int = 5                # eval every N epochs (processor_depth.py:132)
    checkpoint_period: int = 20    # ckpt every N epochs (:119)
    re_ranking: bool = False       # TEST.RE_RANKING
    max_rank: int = 50
    # also evaluate on the training split (memorization diagnostic). Off
    # saves ~half of each eval point's wall time on long runs; the val
    # split remains the model-selection signal either way
    train_split: bool = True


@dataclasses.dataclass
class DatorConfig:
    model: FourDNetConfig = dataclasses.field(default_factory=FourDNetConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    output_dir: str = "./out/dator"
    n_model_shards: int = 1        # mesh "model" axis (2 = reference 2-GPU split)


def _merge_into(obj: Any, updates: dict) -> Any:
    """Recursively apply a dict onto a (possibly frozen) dataclass tree."""
    if not dataclasses.is_dataclass(obj):
        return updates
    fields = {f.name: f for f in dataclasses.fields(obj)}
    kwargs = {}
    for key, value in updates.items():
        if key not in fields:
            raise KeyError(f"unknown config key '{key}' for {type(obj).__name__}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            kwargs[key] = _merge_into(current, value)
        else:
            kwargs[key] = type(current)(value) if current is not None else value
    return dataclasses.replace(obj, **kwargs)


def load_config(yaml_path: str | None = None,
                overrides: list[str] | None = None) -> DatorConfig:
    """defaults -> YAML -> dotted overrides (e.g. 'train.base_lr=0.01')."""
    cfg = DatorConfig()
    if yaml_path:
        import yaml
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        cfg = _merge_into(cfg, data)
    for item in overrides or []:
        key, _, raw = item.partition("=")
        parts = key.strip().split(".")
        tree: dict = {}
        node = tree
        for p in parts[:-1]:
            node[p] = {}
            node = node[p]
        import yaml
        node[parts[-1]] = yaml.safe_load(raw)
        cfg = _merge_into(cfg, tree)
    return cfg
