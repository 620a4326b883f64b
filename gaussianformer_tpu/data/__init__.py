from .dataset import NuScenesDataset
from .synthetic import SyntheticOccDataset
from .loader import DataLoader, ShardedSampler
