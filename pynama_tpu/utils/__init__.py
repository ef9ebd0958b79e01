from pynama_tpu.utils.timer import Timer

__all__ = ["Timer"]
