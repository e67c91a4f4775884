from .normalize import normalize_batch
from .classify import TurnClassifier
from .seal import seal_conversations, compute_hot_convs

__all__ = ["normalize_batch", "TurnClassifier", "seal_conversations", "compute_hot_convs"]
