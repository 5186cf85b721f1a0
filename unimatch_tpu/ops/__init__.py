from unimatch_tpu.ops import geometry, windows, position, upsample, correlation, attention_ops

__all__ = ["geometry", "windows", "position", "upsample", "correlation", "attention_ops"]
