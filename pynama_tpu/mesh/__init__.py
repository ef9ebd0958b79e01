from pynama_tpu.mesh.structured import BoxMesh

__all__ = ["BoxMesh"]
