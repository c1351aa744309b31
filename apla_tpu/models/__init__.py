from .vit import (
    ViTConfig,
    VIT_BUILDERS,
    init_vit_params,
    vit_forward,
    vit_features,
    interpolate_pos_embed,
)
from .classifier import init_classifier, classifier_forward
