from .config import DataloaderConfig, DatasetConfig
from .dataloader import Dataloader
from .jsonl import JsonlDataset
from .packing import HardPackDataset, HybridMLLMPackDataset, PresetPackDataset, SoftPackDataset
from .sampler import ParallelSampler
from .tokenize_fns import OpenaiSFTTokenizeFn, PretrainTokenizeFn

__all__ = [
    "DataloaderConfig",
    "DatasetConfig",
    "Dataloader",
    "JsonlDataset",
    "SoftPackDataset",
    "HardPackDataset",
    "HybridMLLMPackDataset",
    "PresetPackDataset",
    "ParallelSampler",
    "OpenaiSFTTokenizeFn",
    "PretrainTokenizeFn",
]
