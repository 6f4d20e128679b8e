from kytpu.utils.checkpoint import save_checkpoint, load_checkpoint
from kytpu.utils.profiling import RenderTimer, trace_to

__all__ = ["save_checkpoint", "load_checkpoint", "RenderTimer", "trace_to"]
