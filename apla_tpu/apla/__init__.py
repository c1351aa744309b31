from .core import AplaConfig, build_apla, merge_apla_params, sample_indices, load_indices
