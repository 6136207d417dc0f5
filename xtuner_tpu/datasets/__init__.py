from .config import DataloaderConfig, DatasetConfig
from .dataloader import Dataloader
from .ftdp import FtdpTokenizedDataMapping, FtdpTokenizeFn
from .jsonl import JsonlDataset
from .packing import HardPackDataset, HybridMLLMPackDataset, PresetPackDataset, SoftPackDataset
from .rl_tokenize import RLTextTokenizeFn
from .sampler import ParallelSampler, PresetSampler
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
    "PresetSampler",
    "OpenaiSFTTokenizeFn",
    "PretrainTokenizeFn",
    "FtdpTokenizeFn",
    "FtdpTokenizedDataMapping",
    "RLTextTokenizeFn",
]
