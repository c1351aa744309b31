from .transforms import build_transform, Compose
from .loader import DataLoader
from . import datasets
