from .loader import create_dataloader, CreateDataLoader  # noqa: F401
from .dataset import DecVitDataset, VitDataset  # noqa: F401
