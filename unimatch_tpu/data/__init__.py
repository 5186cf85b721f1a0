from unimatch_tpu.data.padder import InputPadder

__all__ = ["InputPadder"]
