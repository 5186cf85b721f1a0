from unimatch_tpu.models.unimatch import UniMatch

__all__ = ["UniMatch"]
