from .extract import build_pipeline, to_dataset

__all__ = ["build_pipeline", "to_dataset"]
