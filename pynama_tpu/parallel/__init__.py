from pynama_tpu.parallel.slab import SlabDecomposition

__all__ = ["SlabDecomposition"]
