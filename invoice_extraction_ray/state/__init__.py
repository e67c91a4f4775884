from .checkpoint import run_checkpointed, read_output, chunk_plan

__all__ = ["run_checkpointed", "read_output", "chunk_plan"]
