from brisk_tpu.oracle import pyref

__all__ = ["pyref"]
