from pynama_tpu.io.xdmf import XdmfWriter
from pynama_tpu.io.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["XdmfWriter", "save_checkpoint", "load_checkpoint"]
