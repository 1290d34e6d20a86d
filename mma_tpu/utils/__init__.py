from mma_tpu.utils.profiling import trace, profile_to, annotate_fn

__all__ = ["trace", "profile_to", "annotate_fn"]
