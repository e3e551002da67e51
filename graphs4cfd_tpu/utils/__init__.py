"""Small utilities: transform composition, dataset splits, profiling."""
from .data import Compose, Subset, ConcatDataset, random_split
from .profiling import trace_annotation, Timer, EdgeRateMeter

__all__ = ["Compose", "Subset", "ConcatDataset", "random_split",
           "trace_annotation", "Timer", "EdgeRateMeter"]
