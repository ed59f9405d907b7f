from .arviz import to_inference_data
from .base import ChainRecordAdapter, IBaseTrace, MultiTrace, NDArray
from .checkpoint import FileTrace
from .inference_data import DataVar, Dataset, InferenceData
from .zarr import ZarrDirStore, ZarrTrace

__all__ = [
    "to_inference_data", "DataVar", "Dataset", "InferenceData",
    "IBaseTrace", "NDArray", "MultiTrace", "ChainRecordAdapter",
    "FileTrace", "ZarrTrace", "ZarrDirStore",
]
