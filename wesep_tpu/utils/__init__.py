from wesep_tpu.utils.runtime import setup_compilation_cache

__all__ = ["setup_compilation_cache"]
