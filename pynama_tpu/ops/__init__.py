from pynama_tpu.ops.assembly import ElementOp, gather, scatter_add

__all__ = ["ElementOp", "gather", "scatter_add"]
