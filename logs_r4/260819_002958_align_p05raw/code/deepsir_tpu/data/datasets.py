"""Dataset factory (reference /root/reference/dataloader/datasets.py:158-204)."""
from __future__ import annotations

from typing import Tuple

from deepsir_tpu.config import Config
from deepsir_tpu.data.base import PairDataset


def _build(cfg: Config, split: str) -> PairDataset:
    ds = cfg.data.dataset_type
    if ds == "KITTI":
        from deepsir_tpu.data.kitti import SemanticKITTIPair
        return SemanticKITTIPair(cfg, split)
    if ds == "3DMatch":
        from deepsir_tpu.data.threedmatch import ThreeDMatch
        return ThreeDMatch(cfg, split)
    if ds == "Oxford":
        from deepsir_tpu.data.oxford import Oxford
        return Oxford(cfg, split)
    if ds == "Synthetic":
        from deepsir_tpu.data.synthetic import SyntheticPairs
        size = {"train": cfg.data.synthetic_train_size,
                "test": cfg.data.synthetic_eval_size}.get(split)
        offset = (cfg.data.synthetic_eval_offset if split == "test" else 0)
        return SyntheticPairs(cfg, split, size=size,
                              noise=cfg.data.synthetic_noise,
                              p_keep=cfg.data.synthetic_p_keep,
                              offset=offset)
    raise NotImplementedError(ds)


def get_train_datasets(cfg: Config) -> Tuple[PairDataset, PairDataset]:
    """(train, val) datasets (reference get_train_datasets_V2)."""
    return _build(cfg, "train"), _build(cfg, "val")


def get_test_dataset(cfg: Config) -> PairDataset:
    """Test dataset (reference get_test_datasets_V2)."""
    return _build(cfg, "test")
