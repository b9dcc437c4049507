"""End-to-end clone pipeline (reference: test.py)."""

from .clone import ClonePipeline, make_pipeline
from .stitch import compound, pad_to_multiple, shifted_window_stack, window_stack
from .stream import StreamingCloner

__all__ = [
    "ClonePipeline", "StreamingCloner", "compound", "make_pipeline",
    "pad_to_multiple", "shifted_window_stack", "window_stack",
]
