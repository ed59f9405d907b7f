from .arviz import to_inference_data
from .inference_data import DataVar, Dataset, InferenceData

__all__ = ["to_inference_data", "DataVar", "Dataset", "InferenceData"]
