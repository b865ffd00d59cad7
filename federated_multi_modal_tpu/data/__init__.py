from federated_multi_modal_tpu.data.datum import Datum
from federated_multi_modal_tpu.data.dataset_base import (
    DatasetBase,
    fewshot_with_cache,
    generate_fewshot,
    read_and_split_data,
    read_split,
    save_split,
    split_trainval,
    subsample_classes,
)
from federated_multi_modal_tpu.data.loader import DataLoader
from federated_multi_modal_tpu.data.manager import (
    ClientDataManager,
    DataManager,
    build_data_loader,
)
from federated_multi_modal_tpu.data.partition import partition_dataset_iid
from federated_multi_modal_tpu.data.transforms import build_transform

__all__ = [
    "Datum",
    "DatasetBase",
    "fewshot_with_cache",
    "generate_fewshot",
    "read_and_split_data",
    "read_split",
    "save_split",
    "split_trainval",
    "subsample_classes",
    "DataLoader",
    "ClientDataManager",
    "DataManager",
    "build_data_loader",
    "partition_dataset_iid",
    "build_transform",
]

# Register the dataset catalog (the reference does this via explicit imports
# in train.py:9-27; importing the package keeps the registry always-populated)
import federated_multi_modal_tpu.data.datasets  # noqa: E402,F401
